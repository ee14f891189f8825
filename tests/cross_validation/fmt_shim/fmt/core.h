// Minimal fmt::format shim for compiling the reference's pt_format.cpp
// (it formats one error message, /root/reference/src/pt-format/pt_format.cpp:
// deserialize's version-mismatch path). Supports only "{}" substitution of
// string-like args, which is all that call site uses.
#pragma once

#include <sstream>
#include <string>
#include <string_view>

namespace fmt
{
namespace detail
{
inline void format_one(std::ostringstream&, std::string_view&) {}

template<typename Arg, typename... Rest>
void format_one(std::ostringstream& out, std::string_view& spec, Arg&& arg, Rest&&... rest)
{
    const auto pos = spec.find("{}");
    if (pos == std::string_view::npos)
    {
        return;
    }
    out << spec.substr(0, pos) << arg;
    spec.remove_prefix(pos + 2);
    format_one(out, spec, rest...);
}
} // namespace detail

template<typename... Args>
std::string format(std::string_view spec, Args&&... args)
{
    std::ostringstream out;
    detail::format_one(out, spec, args...);
    out << spec;
    return out.str();
}
} // namespace fmt
