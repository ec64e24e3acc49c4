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

#include "../simplify/qem_core.hpp"
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

// Sparse-payload variant: scan only cells touching the decode's active
// b-blocks (+1-cell low halo) instead of the full R^3 grid — the scan
// is the dominant cost of the dense entry, and serving payloads carry
// the active-block ids for free. Identical output to mc_run whenever
// the iso-0 surface is confined to active blocks (the hierarchical
// decode's tau-selection guarantee; asserted by the Python parity
// tests).
void* mc_run_blocks(const float* grid, int64_t R, float iso,
                    const float* origin, float spacing,
                    const int32_t* block_ids, int64_t n_blocks,
                    int64_t block, int64_t* nv, int64_t* nf) {
  auto cells = mt::scan_blocks(grid, static_cast<int>(R), iso, block_ids,
                               n_blocks, static_cast<int>(block));
  auto* mesh = new mt::MeshOut(mt::extract(
      grid, static_cast<int>(R), iso, origin, spacing, &cells));
  *nv = static_cast<int64_t>(mesh->verts.size() / 3);
  *nf = static_cast<int64_t>(mesh->faces.size() / 3);
  return mesh;
}

// Payload-direct variant: mesh the v2 serving payload at its native
// block-sparse layout — fill [nb^3] (b-granularity, dequantized f32),
// vals [n_active, b^3], rank [nb^3] (-1 = keep fill) — without ever
// materializing the R^3 dense grid on the host (a 64 MB build+fill pass
// at 256^3 that dominated the serving host cost after the scan fix).
// Identical mesh to mc_run on the reconstructed grid: same candidate
// cells (block scan), same x-major order, same values via the accessor.
void* mc_run_payload(const float* fill, const float* vals,
                     const int32_t* rank, int64_t R, int64_t block,
                     float iso, const float* origin, float spacing,
                     const int32_t* block_ids, int64_t n_blocks,
                     int64_t* nv, int64_t* nf) {
  mt::BlockVF vf{fill, vals, rank, static_cast<int>(R),
                 static_cast<int>(block),
                 static_cast<int>(R / block)};
  auto* mesh = new mt::MeshOut(
      mt::extract_payload(vf, iso, origin, spacing, block_ids, n_blocks));
  *nv = static_cast<int64_t>(mesh->verts.size() / 3);
  *nf = static_cast<int64_t>(mesh->faces.size() / 3);
  return mesh;
}

// Quadric edge-collapse decimation (native/simplify/qem_core.hpp):
// serving-side LOD. Returns a MeshOut handle for mc_copy/mc_free.
// target_faces: decimate to at most this many faces; max_error < 0
// disables the error ceiling. No globals — safe from the serving
// path's mesh-worker threads.
void* simp_run(const float* verts, int64_t nv, const int64_t* faces,
               int64_t nf, int64_t target_faces, double max_error,
               int64_t* nv_out, int64_t* nf_out) {
  auto* mesh = new mt::MeshOut(
      qem::simplify(verts, nv, faces, nf, target_faces, max_error));
  *nv_out = static_cast<int64_t>(mesh->verts.size() / 3);
  *nf_out = static_cast<int64_t>(mesh->faces.size() / 3);
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
