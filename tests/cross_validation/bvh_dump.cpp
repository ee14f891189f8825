// Test harness: compiles the REFERENCE's BVH builder and CPU traversal
// directly from /root/reference (via the minimal glm shim) and dumps results
// for comparison with the Python/native builders and the lockstep traversal
// (tests/test_cross_validation.py).
//
// Usage: bvh_dump <triangles.bin> <rays.bin>
//   triangles.bin: int64 T, then T*9 float32 vertex positions
//   rays.bin:      int64 R, then R*6 float32 (origin, direction)
// Output (stdout, binary):
//   int64 N nodes; N * {6 f32 aabb, 4 u32} node records
//   int64 T; T int64 triangle_indices
//   R * {u8 hit, f32 t, u32 nodes_visited}

#include <common/bvh.hpp>
#include <common/ray.hpp>
#include <common/ray_intersection.hpp>
#include <common/triangle_attributes.hpp>

#include <cfloat>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

int main(int argc, char** argv)
{
    if (argc != 3)
    {
        std::fprintf(stderr, "usage: bvh_dump tris.bin rays.bin\n");
        return 1;
    }

    std::FILE* tf = std::fopen(argv[1], "rb");
    int64_t numTris = 0;
    std::fread(&numTris, sizeof(numTris), 1, tf);
    std::vector<nlrs::Positions> tris(static_cast<std::size_t>(numTris));
    std::fread(tris.data(), sizeof(nlrs::Positions), tris.size(), tf);
    std::fclose(tf);

    const nlrs::Bvh bvh = nlrs::buildBvh(tris);
    const auto ordered =
        nlrs::reorderAttributes(std::span<const nlrs::Positions>(tris), bvh.triangleIndices);

    std::FILE* rf = std::fopen(argv[2], "rb");
    int64_t numRays = 0;
    std::fread(&numRays, sizeof(numRays), 1, rf);
    std::vector<float> rayData(static_cast<std::size_t>(numRays) * 6);
    std::fread(rayData.data(), sizeof(float), rayData.size(), rf);
    std::fclose(rf);

    const int64_t numNodes = static_cast<int64_t>(bvh.nodes.size());
    std::fwrite(&numNodes, sizeof(numNodes), 1, stdout);
    for (const nlrs::BvhNode& node : bvh.nodes)
    {
        float aabb[6] = {
            node.aabb.min.x, node.aabb.min.y, node.aabb.min.z,
            node.aabb.max.x, node.aabb.max.y, node.aabb.max.z};
        std::uint32_t meta[4] = {
            node.trianglesOffset, node.secondChildOffset, node.triangleCount, node.splitAxis};
        std::fwrite(aabb, sizeof(aabb), 1, stdout);
        std::fwrite(meta, sizeof(meta), 1, stdout);
    }

    std::fwrite(&numTris, sizeof(numTris), 1, stdout);
    for (std::size_t idx : bvh.triangleIndices)
    {
        const int64_t v = static_cast<int64_t>(idx);
        std::fwrite(&v, sizeof(v), 1, stdout);
    }

    for (int64_t r = 0; r < numRays; ++r)
    {
        const float* p = rayData.data() + r * 6;
        const nlrs::Ray ray{{p[0], p[1], p[2]}, {p[3], p[4], p[5]}};
        nlrs::Intersection isect;
        nlrs::BvhStats stats;
        const bool hit =
            nlrs::rayIntersectBvh(ray, bvh.nodes, ordered, FLT_MAX, isect, &stats);
        const std::uint8_t hitByte = hit ? 1 : 0;
        const float t = hit ? isect.t : 0.0f;
        std::fwrite(&hitByte, 1, 1, stdout);
        std::fwrite(&t, sizeof(t), 1, stdout);
        std::fwrite(&stats.nodesVisited, sizeof(stats.nodesVisited), 1, stdout);
    }
    return 0;
}
