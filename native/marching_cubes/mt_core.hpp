// Marching-tetrahedra isosurface core: identical algorithm to the Python
// reference (ops/isosurface.py) — 6-tet cube decomposition around the main
// diagonal, lattice-edge-keyed vertex welding — promoted to C++ for 512^3
// grids (SURVEY.md s2.4 native ledger).
//
// Three entry shapes, sharing one polygonizer that is generic over a
// value accessor (so the block-sparse serving payload can be meshed
// WITHOUT materializing the 64 MB dense grid on the host):
//   extract(grid, ...)             dense grid, full parallel scan
//   extract(grid, ..., &cells)     dense grid, pre-scanned cells
//   extract_payload(BlockVF, ...)  block-sparse payload, block scan
#pragma once
#include <algorithm>
#include <array>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace mt {

struct MeshOut {
  std::vector<float> verts;    // [nv*3]
  std::vector<int64_t> faces;  // [nf*3]
};

// Corner order: bit0=x, bit1=y, bit2=z (matches the Python tables).
inline constexpr int kCorners[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {0, 1, 0}, {1, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {0, 1, 1}, {1, 1, 1}};
inline constexpr int kTets[6][4] = {
    {0, 1, 3, 7}, {0, 3, 2, 7}, {0, 2, 6, 7},
    {0, 6, 4, 7}, {0, 4, 5, 7}, {0, 5, 1, 7}};

// Value accessor over the v2 serving payload at its native layout:
// b-granularity fill (f32, already dequantized) + active fine rows.
// rank[id] is the row of block id in vals, or -1 if the block keeps its
// fill value. Lattice id g is x-major ((x*R + y)*R + z).
struct BlockVF {
  const float* fill;    // [nb^3]
  const float* vals;    // [n_active, b^3] x-major within block
  const int32_t* rank;  // [nb^3]
  int R, b, nb;
  float operator()(int64_t g) const {
    // R and b are powers of two on every decode path (res % 16 == 0
    // with 2^k factors; b in {2,4}); shift/mask addressing saves ~2x
    // on the 10^7-call meshing hot loop vs div/mod. The general
    // fallback keeps correctness for exotic resolutions.
    if ((R & (R - 1)) == 0 && (b & (b - 1)) == 0) {
      const int sR = __builtin_ctz(static_cast<unsigned>(R));
      const int sB = __builtin_ctz(static_cast<unsigned>(b));
      const int z = static_cast<int>(g & (R - 1));
      const int y = static_cast<int>((g >> sR) & (R - 1));
      const int x = static_cast<int>(g >> (2 * sR));
      const int64_t id =
          ((static_cast<int64_t>(x >> sB) * nb) + (y >> sB)) * nb
          + (z >> sB);
      const int32_t r = rank[id];
      if (r < 0) return fill[id];
      const int m = b - 1;
      return vals[(static_cast<int64_t>(r) << (3 * sB)) +
                  ((((x & m) << sB) + (y & m)) << sB) + (z & m)];
    }
    const int z = static_cast<int>(g % R);
    const int y = static_cast<int>((g / R) % R);
    const int x = static_cast<int>(g / (static_cast<int64_t>(R) * R));
    const int64_t id =
        (static_cast<int64_t>(x / b) * nb + y / b) * nb + z / b;
    const int32_t r = rank[id];
    if (r < 0) return fill[id];
    return vals[static_cast<int64_t>(r) * b * b * b +
                (static_cast<int64_t>(x % b) * b + y % b) * b + (z % b)];
  }
};

// Phase 1 for sparse serving payloads: candidate cells are only those
// touching (or one cell below — the low-face halo) an ACTIVE b-block of
// the hierarchical decode. The decode's tau selection guarantees the
// iso-0 surface only intersects active blocks, so every crossing cell
// of the reconstructed grid touches one; a bitmap dedups the halo
// overlap between adjacent blocks and keeps the scan order (and hence
// vertex welding order) identical to the dense scan's x-major order.
template <class VF>
inline std::vector<int64_t> scan_blocks_vf(VF&& value, int R, float iso,
                                           const int32_t* block_ids,
                                           int64_t n_blocks, int b) {
  const int n = R - 1, nb = R / b;
  const size_t ncells = static_cast<size_t>(n) * n * n;
  std::vector<uint64_t> bits(ncells / 64 + 1, 0);
  for (int64_t i = 0; i < n_blocks; ++i) {
    const int64_t id = block_ids[i];
    const int bz = static_cast<int>(id % nb);
    const int by = static_cast<int>((id / nb) % nb);
    const int bx = static_cast<int>(id / (static_cast<int64_t>(nb) * nb));
    const int x0 = bx * b > 0 ? bx * b - 1 : 0;
    const int x1 = std::min(bx * b + b - 1, n - 1);
    const int y0 = by * b > 0 ? by * b - 1 : 0;
    const int y1 = std::min(by * b + b - 1, n - 1);
    const int z0 = bz * b > 0 ? bz * b - 1 : 0;
    const int z1 = std::min(bz * b + b - 1, n - 1);
    for (int x = x0; x <= x1; ++x)
      for (int y = y0; y <= y1; ++y) {
        const int64_t base = (static_cast<int64_t>(x) * n + y) * n;
        for (int z = z0; z <= z1; ++z) {
          const int64_t c = base + z;
          bits[c >> 6] |= uint64_t(1) << (c & 63);
        }
      }
  }
  auto gid = [&](int x, int y, int z) -> int64_t {
    return (static_cast<int64_t>(x) * R + y) * R + z;
  };
  std::vector<int64_t> cells;
  for (size_t w = 0; w < bits.size(); ++w) {
    uint64_t word = bits[w];
    while (word) {
      const int bit = __builtin_ctzll(word);
      word &= word - 1;
      const int64_t c = (static_cast<int64_t>(w) << 6) + bit;
      const int z = static_cast<int>(c % n);
      const int y = static_cast<int>((c / n) % n);
      const int x = static_cast<int>(c / (static_cast<int64_t>(n) * n));
      bool lo = false, hi = false;
      for (int k = 0; k < 8; ++k) {
        const float v = value(gid(x + kCorners[k][0], y + kCorners[k][1],
                                  z + kCorners[k][2]));
        (v < iso ? lo : hi) = true;
      }
      if (lo && hi) cells.push_back(c);
    }
  }
  return cells;  // already x-major sorted (bitmap order)
}

inline std::vector<int64_t> scan_blocks(const float* grid, int R,
                                        float iso,
                                        const int32_t* block_ids,
                                        int64_t n_blocks, int b) {
  return scan_blocks_vf([grid](int64_t g) { return grid[g]; }, R, iso,
                        block_ids, n_blocks, b);
}

// Open-addressing edge->vertex map (linear probe, pow2 capacity).
// Keys are lo*R^3+hi with lo<hi, so key 0 never occurs -> 0 = empty.
// Replaces std::unordered_map in the welding hot loop: contiguous
// probes instead of a bucket pointer chase. Together with the cached
// corner values, the quad 6->4 edge dedup, the output reserves, and
// the -O3 build, a 660k-face payload mesh at 256^3 dropped 291->200 ms
// end-to-end through the ctypes entry (same mesh, bit-identical).
class EdgeMap {
 public:
  // capacity = next_pow2(expected); grows at load 0.5. Welded meshes
  // produce ~0.7 vertices per crossing cell, so the caller's
  // 2*cells estimate keeps the initial load under ~0.35.
  explicit EdgeMap(size_t expected) { rehash(next_pow2(expected)); }

  // Returns the vertex id for key, or -1 if absent (caller inserts the
  // new id via the returned slot to avoid a second probe).
  int64_t find_or_prepare(uint64_t key, size_t* slot) {
    if (size_ * 2 >= keys_.size()) rehash(keys_.size() * 2);
    size_t i = mix(key) & mask_;
    while (true) {
      if (keys_[i] == 0) {
        *slot = i;
        return -1;
      }
      if (keys_[i] == key) return vals_[i];
      i = (i + 1) & mask_;
    }
  }
  void insert_at(size_t slot, uint64_t key, int64_t val) {
    keys_[slot] = key;
    vals_[slot] = val;
    ++size_;
  }

 private:
  static size_t next_pow2(size_t n) {
    size_t p = 64;
    while (p < n) p <<= 1;
    return p;
  }
  static uint64_t mix(uint64_t x) {  // splitmix64 finalizer
    x += 0x9e3779b97f4a7c15ull;
    x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
    x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
    return x ^ (x >> 31);
  }
  void rehash(size_t cap) {
    std::vector<uint64_t> ok = std::move(keys_);
    std::vector<int64_t> ov = std::move(vals_);
    keys_.assign(cap, 0);
    vals_.assign(cap, 0);
    mask_ = cap - 1;
    for (size_t i = 0; i < ok.size(); ++i) {
      if (ok[i] == 0) continue;
      size_t j = mix(ok[i]) & mask_;
      while (keys_[j] != 0) j = (j + 1) & mask_;
      keys_[j] = ok[i];
      vals_[j] = ov[i];
    }
  }
  std::vector<uint64_t> keys_;
  std::vector<int64_t> vals_;
  size_t mask_ = 0, size_ = 0;
};

// Phase 2: polygonize pre-scanned crossing cells (x-major sorted) with
// lattice-edge welded vertices. Generic over the value accessor.
template <class VF>
inline MeshOut polygonize(VF&& value, int R, float iso,
                          const float origin[3], float spacing,
                          const std::vector<int64_t>& cells) {
  MeshOut out;
  // ~3 welded verts and ~6 faces per crossing cell (measured on trained
  // decoders + analytic shapes); reserving avoids the growth-doubling
  // memcpys of multi-MB vectors in the hot loop.
  out.verts.reserve(cells.size() * 12);
  out.faces.reserve(cells.size() * 20);
  EdgeMap edge_to_vertex(cells.size() * 2 + 16);
  const int64_t R3 = static_cast<int64_t>(R) * R * R;
  const int n = R - 1;

  auto gid = [&](int x, int y, int z) -> int64_t {
    return (static_cast<int64_t>(x) * R + y) * R + z;
  };

  // Emit (or reuse) the welded vertex on lattice edge (ga, gb). Corner
  // values arrive from the caller's per-cell cache — re-fetching them
  // through the accessor cost ~2 extra payload reads per new vertex.
  auto edge_vertex = [&](int64_t ga, float va, int64_t gb,
                         float vb) -> int64_t {
    int64_t lo = ga < gb ? ga : gb, hi = ga < gb ? gb : ga;
    uint64_t key = static_cast<uint64_t>(lo) * static_cast<uint64_t>(R3)
                   + static_cast<uint64_t>(hi);
    size_t slot;
    int64_t found = edge_to_vertex.find_or_prepare(key, &slot);
    if (found >= 0) return found;
    float denom = vb - va;
    float t = std::abs(denom) > 1e-12f ? (iso - va) / denom : 0.5f;
    t = t < 0 ? 0 : (t > 1 ? 1 : t);
    // decode lattice coords
    auto coords = [&](int64_t g, float* p) {
      int z = static_cast<int>(g % R);
      int y = static_cast<int>((g / R) % R);
      int x = static_cast<int>(g / (static_cast<int64_t>(R) * R));
      p[0] = origin[0] + spacing * x;
      p[1] = origin[1] + spacing * y;
      p[2] = origin[2] + spacing * z;
    };
    float pa[3], pb[3];
    coords(ga, pa);
    coords(gb, pb);
    int64_t idx = static_cast<int64_t>(out.verts.size() / 3);
    for (int i = 0; i < 3; ++i)
      out.verts.push_back(pa[i] + t * (pb[i] - pa[i]));
    edge_to_vertex.insert_at(slot, key, idx);
    return idx;
  };

  struct EdgeRef {
    int64_t g;
    float v;
  };
  auto ev = [&](EdgeRef a, EdgeRef b) {
    return edge_vertex(a.g, a.v, b.g, b.v);
  };
  auto push_tri = [&](int64_t v0, int64_t v1, int64_t v2) {
    if (v0 == v1 || v1 == v2 || v0 == v2) return;  // degenerate after weld
    out.faces.push_back(v0);
    out.faces.push_back(v1);
    out.faces.push_back(v2);
  };

  int64_t cg[8];
  float cv[8];
  for (int64_t cell : cells) {
    const int z = static_cast<int>(cell % n);
    const int y = static_cast<int>((cell / n) % n);
    const int x = static_cast<int>(cell / (static_cast<int64_t>(n) * n));
    for (int c = 0; c < 8; ++c) {
      cg[c] = gid(x + kCorners[c][0], y + kCorners[c][1],
                  z + kCorners[c][2]);
      cv[c] = value(cg[c]);  // 8 loads/cell, not 24 (per-tet corners)
    }
    for (const auto& tet : kTets) {
      EdgeRef t[4];
      int mask = 0;
      for (int i = 0; i < 4; ++i) {
        t[i] = {cg[tet[i]], cv[tet[i]]};
        if (t[i].v < iso) mask |= 1 << i;
      }
      if (mask == 0 || mask == 15) continue;
      int count = __builtin_popcount(static_cast<unsigned>(mask));
      if (count == 1 || count == 3) {
        int lone = -1;
        for (int i = 0; i < 4; ++i) {
          bool inside = (mask >> i) & 1;
          if ((count == 1 && inside) || (count == 3 && !inside)) lone = i;
        }
        int o[3], oi = 0;
        for (int i = 0; i < 4; ++i)
          if (i != lone) o[oi++] = i;
        // sequenced: arg evaluation order is unspecified in C++, and
        // vertex ids must be minted in emission order for bit-parity
        // with the Python mesher
        const int64_t v0 = ev(t[lone], t[o[0]]);
        const int64_t v1 = ev(t[lone], t[o[1]]);
        const int64_t v2 = ev(t[lone], t[o[2]]);
        push_tri(v0, v1, v2);
      } else {  // count == 2: quad -> 2 triangles (4 unique edges;
                // vertex creation order matches the old 6-lookup form)
        int a = -1, b = -1, c = -1, d = -1;
        for (int i = 0; i < 4; ++i) {
          if ((mask >> i) & 1) (a < 0 ? a : b) = i;
          else (c < 0 ? c : d) = i;
        }
        const int64_t vac = ev(t[a], t[c]);
        const int64_t vad = ev(t[a], t[d]);
        const int64_t vbd = ev(t[b], t[d]);
        const int64_t vbc = ev(t[b], t[c]);
        push_tri(vac, vad, vbd);
        push_tri(vac, vbd, vbc);
      }
    }
  }
  return out;
}

// grid: R^3 float32, x-major (index (i*R + j)*R + k).
// pre_cells: pre-scanned crossing cells (x-major sorted) or nullptr to
// scan the full grid in parallel.
inline MeshOut extract(const float* grid, int R, float iso,
                       const float origin[3], float spacing,
                       const std::vector<int64_t>* pre_cells = nullptr) {
  const int n = R - 1;
  std::vector<int64_t> cells;
  if (pre_cells == nullptr) {
    // Parallel scan for surface-crossing cells. A cell crosses only if a
    // sign change occurs among its 8 corners; scanning is ~99% of the
    // work at 512^3 so it fans out over x-slabs, while the welding
    // polygonization of the ~1% active cells stays single-threaded.
    const unsigned n_threads =
        std::max(1u, std::thread::hardware_concurrency());
    std::vector<std::vector<int64_t>> found(n_threads);
    {
      std::atomic<int> next_x{0};
      auto scan = [&](unsigned tid) {
        auto& mine = found[tid];
        int x;
        while ((x = next_x.fetch_add(1)) < n) {
          for (int y = 0; y < n; ++y) {
            const float* row0 = grid + (static_cast<int64_t>(x) * R + y) * R;
            const float* row1 = row0 + R;                    // y+1
            const float* row2 = row0 + static_cast<int64_t>(R) * R;  // x+1
            const float* row3 = row2 + R;                    // x+1, y+1
            for (int z = 0; z < n; ++z) {
              bool lo = false, hi = false;
              for (const float* r : {row0, row1, row2, row3}) {
                (r[z] < iso ? lo : hi) = true;
                (r[z + 1] < iso ? lo : hi) = true;
              }
              if (lo && hi)
                mine.push_back((static_cast<int64_t>(x) * n + y) * n + z);
            }
          }
        }
      };
      std::vector<std::thread> pool;
      for (unsigned t = 0; t < n_threads; ++t) pool.emplace_back(scan, t);
      for (auto& t : pool) t.join();
    }
    // Deterministic order regardless of thread scheduling.
    size_t total = 0;
    for (auto& f : found) total += f.size();
    cells.reserve(total);
    for (auto& f : found) cells.insert(cells.end(), f.begin(), f.end());
    std::sort(cells.begin(), cells.end());
  } else {
    cells = *pre_cells;
  }
  return polygonize([grid](int64_t g) { return grid[g]; }, R, iso, origin,
                    spacing, cells);
}

// Mesh the v2 serving payload directly (no dense grid on the host).
inline MeshOut extract_payload(const BlockVF& vf, float iso,
                               const float origin[3], float spacing,
                               const int32_t* block_ids,
                               int64_t n_blocks) {
  auto cells = scan_blocks_vf(vf, vf.R, iso, block_ids, n_blocks, vf.b);
  return polygonize(vf, vf.R, iso, origin, spacing, cells);
}

}  // namespace mt
