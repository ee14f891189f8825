// Minimal glm-compatible shim: just enough of the vector API for the
// reference's CPU geometry code (aabb.hpp, bvh.cpp, ray_intersection.cpp,
// triangle_attributes.hpp) to compile in the cross-validation harness.
// Semantics match glm's float vec3 componentwise operations.
#pragma once

#include <cmath>

namespace glm
{

struct vec3
{
    float x = 0.0f, y = 0.0f, z = 0.0f;

    vec3() = default;
    explicit vec3(float v) : x(v), y(v), z(v) {}
    vec3(float x_, float y_, float z_) : x(x_), y(y_), z(z_) {}

    float& operator[](int i) { return i == 0 ? x : (i == 1 ? y : z); }
    const float& operator[](int i) const { return i == 0 ? x : (i == 1 ? y : z); }

    vec3& operator+=(const vec3& o)
    {
        x += o.x;
        y += o.y;
        z += o.z;
        return *this;
    }
};

inline vec3 operator+(const vec3& a, const vec3& b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline vec3 operator-(const vec3& a, const vec3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline vec3 operator*(float s, const vec3& v) { return {s * v.x, s * v.y, s * v.z}; }
inline vec3 operator*(const vec3& v, float s) { return s * v; }
inline vec3 operator/(float s, const vec3& v) { return {s / v.x, s / v.y, s / v.z}; }
inline vec3 operator/(const vec3& v, float s) { return {v.x / s, v.y / s, v.z / s}; }

inline vec3 min(const vec3& a, const vec3& b)
{
    return {a.x < b.x ? a.x : b.x, a.y < b.y ? a.y : b.y, a.z < b.z ? a.z : b.z};
}
inline vec3 max(const vec3& a, const vec3& b)
{
    return {a.x > b.x ? a.x : b.x, a.y > b.y ? a.y : b.y, a.z > b.z ? a.z : b.z};
}
inline float dot(const vec3& a, const vec3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline vec3 cross(const vec3& a, const vec3& b)
{
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline float length(const vec3& v) { return std::sqrt(dot(v, v)); }
inline vec3 normalize(const vec3& v) { return v / length(v); }

struct vec2
{
    float x = 0.0f, y = 0.0f;
    vec2() = default;
    vec2(float x_, float y_) : x(x_), y(y_) {}
};

struct vec4
{
    float x = 0.0f, y = 0.0f, z = 0.0f, w = 0.0f;
    vec4() = default;
    explicit vec4(float v) : x(v), y(v), z(v), w(v) {}
    vec4(float x_, float y_, float z_, float w_) : x(x_), y(y_), z(z_), w(w_) {}
    vec4(const vec3& v, float w_) : x(v.x), y(v.y), z(v.z), w(w_) {}
};

struct ivec3
{
    int x = 0, y = 0, z = 0;
    ivec3() = default;
    ivec3(int x_, int y_, int z_) : x(x_), y(y_), z(z_) {}
};

} // namespace glm
