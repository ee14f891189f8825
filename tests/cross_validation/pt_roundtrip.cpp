// Interop harness: compiles the REFERENCE's PTFORMAT3 serializer
// (/root/reference/src/pt-format/pt_format.cpp:153-321) and round-trips a
// .pt file through it: deserialize -> re-serialize -> stdout. If the bytes
// our writer (rayfinder_tpu/io/ptformat.py) produced come back identical,
// the layouts agree field-for-field (counts, padding, ordering, texture
// records) — the reference's own NLRS_ASSERTs fire on any structural
// mismatch during deserialize.
//
// Usage: pt_roundtrip <scene.pt>   (round-tripped bytes on stdout)
//
// The PtFormat(gltfPath) constructor drags in the gltf/BVH build stack; it
// is never called here and -ffunction-sections -Wl,--gc-sections drops it,
// so only the stream serializer is linked.

#include <pt-format/pt_format.hpp>
#include <common/stream.hpp>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace
{
class FileInputStream final : public nlrs::InputStream
{
public:
    explicit FileInputStream(std::FILE* f)
        : mFile(f)
    {
    }

    std::size_t read(char* data, std::size_t numBytes) override
    {
        return std::fread(data, 1, numBytes, mFile);
    }

private:
    std::FILE* mFile;
};

class FileOutputStream final : public nlrs::OutputStream
{
public:
    explicit FileOutputStream(std::FILE* f)
        : mFile(f)
    {
    }

    void write(const char* data, std::size_t numBytes) override
    {
        std::fwrite(data, 1, numBytes, mFile);
    }

private:
    std::FILE* mFile;
};
} // namespace

int main(int argc, char** argv)
{
    if (argc != 2)
    {
        std::fprintf(stderr, "usage: pt_roundtrip scene.pt\n");
        return 1;
    }
    std::FILE* in = std::fopen(argv[1], "rb");
    if (!in)
    {
        std::fprintf(stderr, "cannot open %s\n", argv[1]);
        return 1;
    }

    nlrs::PtFormat format;
    {
        FileInputStream stream(in);
        nlrs::deserialize(stream, format);
    }
    std::fclose(in);

    {
        FileOutputStream stream(stdout);
        nlrs::serialize(stream, format);
    }
    std::fflush(stdout);
    return 0;
}
