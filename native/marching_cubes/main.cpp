// marching_cubes: dense SDF grid -> triangle mesh (binary protocol used by
// ops/isosurface.extract_mesh).
//
// Input file : int32 R; float32 iso, origin[3], spacing; R^3 float32
//              values (x-major).
// Output file: int64 nv, nf; nv*3 float32 vertices; nf*3 int64 faces.
//
// Usage: marching_cubes <grid.bin> <mesh.bin>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <vector>

#include "mt_core.hpp"

int main(int argc, char** argv) {
  if (argc != 3) {
    std::fprintf(stderr, "usage: %s <grid.bin> <mesh.bin>\n", argv[0]);
    return 2;
  }
  FILE* f = std::fopen(argv[1], "rb");
  if (!f) {
    std::perror(argv[1]);
    return 1;
  }
  int32_t R = 0;
  float iso = 0, origin[3] = {0, 0, 0}, spacing = 0;
  if (std::fread(&R, 4, 1, f) != 1 || std::fread(&iso, 4, 1, f) != 1
      || std::fread(origin, 4, 3, f) != 3
      || std::fread(&spacing, 4, 1, f) != 1) {
    std::fprintf(stderr, "bad header\n");
    return 1;
  }
  std::vector<float> grid(static_cast<size_t>(R) * R * R);
  if (std::fread(grid.data(), 4, grid.size(), f) != grid.size()) {
    std::fprintf(stderr, "short grid read\n");
    return 1;
  }
  std::fclose(f);

  mt::MeshOut mesh = mt::extract(grid.data(), R, iso, origin, spacing);

  FILE* o = std::fopen(argv[2], "wb");
  if (!o) {
    std::perror(argv[2]);
    return 1;
  }
  int64_t nv = static_cast<int64_t>(mesh.verts.size() / 3);
  int64_t nf = static_cast<int64_t>(mesh.faces.size() / 3);
  std::fwrite(&nv, 8, 1, o);
  std::fwrite(&nf, 8, 1, o);
  std::fwrite(mesh.verts.data(), 4, mesh.verts.size(), o);
  std::fwrite(mesh.faces.data(), 8, mesh.faces.size(), o);
  std::fclose(o);
  return 0;
}
