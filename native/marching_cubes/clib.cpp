// C ABI for in-process isosurface extraction (ctypes; no pybind needed).
//
// The subprocess protocol (main.cpp) costs a 64 MB tempfile round-trip
// plus a process spawn per 256^3 mesh — material on the serving path,
// where host meshing is the per-shape bottleneck once d2h is
// overlapped. This entry keeps everything in memory:
//
//   h = mc_run(grid, R, iso, origin, spacing, &nv, &nf)  // extract
//   mc_copy(h, verts, faces)   // caller-allocated [nv*3] f32 / [nf*3] i64
//   mc_free(h)
//
// mt::extract holds no global state, so concurrent mc_run calls from a
// host thread pool are safe (each call parallelizes its own scan).
#include <cstdint>
#include <cstring>

#include "mt_core.hpp"

extern "C" {

void* mc_run(const float* grid, int64_t R, float iso, const float* origin,
             float spacing, int64_t* nv, int64_t* nf) {
  auto* mesh = new mt::MeshOut(
      mt::extract(grid, static_cast<int>(R), iso, origin, spacing));
  *nv = static_cast<int64_t>(mesh->verts.size() / 3);
  *nf = static_cast<int64_t>(mesh->faces.size() / 3);
  return mesh;
}

void mc_copy(void* handle, float* verts, int64_t* faces) {
  auto* mesh = static_cast<mt::MeshOut*>(handle);
  std::memcpy(verts, mesh->verts.data(), mesh->verts.size() * sizeof(float));
  std::memcpy(faces, mesh->faces.data(),
              mesh->faces.size() * sizeof(int64_t));
}

void mc_free(void* handle) { delete static_cast<mt::MeshOut*>(handle); }

}  // extern "C"
