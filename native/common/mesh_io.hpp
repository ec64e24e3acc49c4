// OBJ / PLY triangle-mesh loading (fan-triangulates polygons).
// PLY: ascii AND binary_little_endian 1.0 — vertex x/y/z located by
// property name (extra per-vertex properties skipped), faces read from
// the leading index-list property. Mirrors the Python reader in
// latent_diffusion_models_for_shape_sdfs_tpu/utils/meshio.py.
#pragma once
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

#include "vec3.hpp"

struct Mesh {
  std::vector<Vec3> verts;
  std::vector<std::array<int, 3>> faces;
};

// Hostile-mesh guard (real-world ShapeNet inputs are routinely broken):
// drops faces with out-of-range indices, non-finite corner coordinates,
// or repeated indices (exact degenerates), then compacts the vertex
// array to referenced vertices only — so downstream bbox/normalization
// math never touches an orphaned NaN vertex. Returns the number of
// dropped faces. Non-manifold fans, self-intersections, and open
// boundaries are NOT errors: the BVH + generalized winding number
// consumer handles them by construction.
inline size_t sanitize_mesh(Mesh* m) {
  const int n = static_cast<int>(m->verts.size());
  auto finite_vert = [&](int i) {
    const Vec3& v = m->verts[i];
    return std::isfinite(v.x) && std::isfinite(v.y) && std::isfinite(v.z);
  };
  std::vector<std::array<int, 3>> keep;
  keep.reserve(m->faces.size());
  for (const auto& f : m->faces) {
    bool ok = true;
    for (int k = 0; k < 3; ++k)
      ok = ok && f[k] >= 0 && f[k] < n && finite_vert(f[k]);
    if (ok && (f[0] == f[1] || f[1] == f[2] || f[0] == f[2])) ok = false;
    if (ok) keep.push_back(f);
  }
  const size_t dropped = m->faces.size() - keep.size();
  std::vector<int> remap(n, -1);
  std::vector<Vec3> nv;
  nv.reserve(m->verts.size());
  for (auto& f : keep)
    for (int k = 0; k < 3; ++k) {
      if (remap[f[k]] < 0) {
        remap[f[k]] = static_cast<int>(nv.size());
        nv.push_back(m->verts[f[k]]);
      }
      f[k] = remap[f[k]];
    }
  m->verts = std::move(nv);
  m->faces = std::move(keep);
  return dropped;
}

inline Mesh load_obj(const std::string& path) {
  std::ifstream in(path);
  if (!in) throw std::runtime_error("cannot open " + path);
  Mesh m;
  std::string line;
  while (std::getline(in, line)) {
    std::istringstream ss(line);
    std::string tag;
    ss >> tag;
    if (tag == "v") {
      Vec3 v;
      ss >> v.x >> v.y >> v.z;
      m.verts.push_back(v);
    } else if (tag == "f") {
      std::vector<int> idx;
      std::string tok;
      bool bad = false;
      while (ss >> tok) {
        try {
          int i = std::stoi(tok.substr(0, tok.find('/')));
          // OBJ negative indices are relative to the vertices read so far
          idx.push_back(i < 0 ? static_cast<int>(m.verts.size()) + i
                              : i - 1);
        } catch (const std::exception&) {  // garbage token: skip face
          bad = true;
          break;
        }
      }
      if (bad) continue;
      for (size_t k = 1; k + 1 < idx.size(); ++k)
        m.faces.push_back({idx[0], idx[k], idx[k + 1]});
    }
  }
  return m;
}

namespace ply_detail {

inline int scalar_size(const std::string& t) {
  if (t == "char" || t == "int8" || t == "uchar" || t == "uint8") return 1;
  if (t == "short" || t == "int16" || t == "ushort" || t == "uint16")
    return 2;
  if (t == "int" || t == "int32" || t == "uint" || t == "uint32" ||
      t == "float" || t == "float32")
    return 4;
  if (t == "double" || t == "float64") return 8;
  throw std::runtime_error("unknown PLY scalar type: " + t);
}

// Read one little-endian scalar at p as double (values) / long (indices).
inline double read_scalar(const unsigned char* p, const std::string& t) {
  auto as = [&](auto v) {
    std::memcpy(&v, p, sizeof(v));
    return static_cast<double>(v);
  };
  if (t == "char" || t == "int8") return as(int8_t{});
  if (t == "uchar" || t == "uint8") return as(uint8_t{});
  if (t == "short" || t == "int16") return as(int16_t{});
  if (t == "ushort" || t == "uint16") return as(uint16_t{});
  if (t == "int" || t == "int32") return as(int32_t{});
  if (t == "uint" || t == "uint32") return as(uint32_t{});
  if (t == "float" || t == "float32") return as(float{});
  return as(double{});
}

struct Prop {
  bool is_list = false;
  std::string type;        // scalar type, or list index type
  std::string count_type;  // list count type
  std::string name;
};

struct Element {
  std::string name;
  size_t count = 0;
  std::vector<Prop> props;
};

}  // namespace ply_detail

inline Mesh load_ply(const std::string& path) {
  using namespace ply_detail;
  std::ifstream in(path, std::ios::binary);
  if (!in) throw std::runtime_error("cannot open " + path);
  std::string line, fmt;
  std::vector<Element> elements;
  while (std::getline(in, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    std::istringstream ss(line);
    std::string tag;
    ss >> tag;
    if (tag == "format") {
      ss >> fmt;
    } else if (tag == "element") {
      Element e;
      ss >> e.name >> e.count;
      elements.push_back(e);
    } else if (tag == "property" && !elements.empty()) {
      Prop p;
      std::string t;
      ss >> t;
      if (t == "list") {
        p.is_list = true;
        ss >> p.count_type >> p.type >> p.name;
      } else {
        p.type = t;
        ss >> p.name;
      }
      elements.back().props.push_back(p);
    } else if (tag == "end_header") {
      break;
    }
  }
  if (fmt != "ascii" && fmt != "binary_little_endian")
    throw std::runtime_error("unsupported PLY format: " + fmt);

  Mesh m;
  if (fmt == "ascii") {
    for (const auto& e : elements) {
      if (e.name == "vertex") {
        int cx = -1, cy = -1, cz = -1;
        for (size_t i = 0; i < e.props.size(); ++i) {
          if (e.props[i].name == "x") cx = (int)i;
          if (e.props[i].name == "y") cy = (int)i;
          if (e.props[i].name == "z") cz = (int)i;
        }
        if (cx < 0 || cy < 0 || cz < 0)
          throw std::runtime_error("PLY vertex needs x/y/z");
        m.verts.reserve(e.count);
        for (size_t i = 0; i < e.count; ++i) {
          std::getline(in, line);
          std::istringstream ss(line);
          std::vector<double> vals(e.props.size());
          for (auto& v : vals) ss >> v;
          m.verts.push_back({(float)vals[cx], (float)vals[cy],
                             (float)vals[cz]});
        }
      } else if (e.name == "face") {
        for (size_t i = 0; i < e.count; ++i) {
          std::getline(in, line);
          std::istringstream ss(line);
          int k;
          ss >> k;
          std::vector<int> idx(k);
          for (int j = 0; j < k; ++j) ss >> idx[j];
          for (int j = 1; j + 1 < k; ++j)
            m.faces.push_back({idx[0], idx[j], idx[j + 1]});
        }
      } else {
        for (size_t i = 0; i < e.count; ++i) std::getline(in, line);
      }
    }
    return m;
  }

  // binary_little_endian: slurp the rest of the stream, walk records
  std::vector<unsigned char> buf{std::istreambuf_iterator<char>(in),
                                 std::istreambuf_iterator<char>()};
  size_t pos = 0;
  auto need = [&](size_t n) {
    if (pos + n > buf.size())
      throw std::runtime_error("truncated binary PLY");
  };
  for (const auto& e : elements) {
    if (e.name == "vertex") {
      int cx = -1, cy = -1, cz = -1;
      size_t stride = 0;
      std::vector<size_t> offs(e.props.size());
      for (size_t i = 0; i < e.props.size(); ++i) {
        if (e.props[i].is_list)
          throw std::runtime_error("list property on vertex unsupported");
        offs[i] = stride;
        stride += scalar_size(e.props[i].type);
        if (e.props[i].name == "x") cx = (int)i;
        if (e.props[i].name == "y") cy = (int)i;
        if (e.props[i].name == "z") cz = (int)i;
      }
      if (cx < 0 || cy < 0 || cz < 0)
        throw std::runtime_error("PLY vertex needs x/y/z");
      need(stride * e.count);
      m.verts.reserve(e.count);
      for (size_t i = 0; i < e.count; ++i) {
        const unsigned char* p = buf.data() + pos + i * stride;
        m.verts.push_back(
            {(float)read_scalar(p + offs[cx], e.props[cx].type),
             (float)read_scalar(p + offs[cy], e.props[cy].type),
             (float)read_scalar(p + offs[cz], e.props[cz].type)});
      }
      pos += stride * e.count;
    } else if (e.name == "face") {
      if (e.props.empty() || !e.props[0].is_list)
        throw std::runtime_error("face element must lead with a list");
      if (e.props.size() != 1)
        throw std::runtime_error("extra face properties unsupported");
      const size_t csz = scalar_size(e.props[0].count_type);
      const size_t isz = scalar_size(e.props[0].type);
      for (size_t i = 0; i < e.count; ++i) {
        need(csz);
        const int k =
            (int)read_scalar(buf.data() + pos, e.props[0].count_type);
        pos += csz;
        need(isz * k);
        std::vector<int> idx(k);
        for (int j = 0; j < k; ++j)
          idx[j] = (int)read_scalar(buf.data() + pos + j * isz,
                                    e.props[0].type);
        pos += isz * k;
        for (int j = 1; j + 1 < k; ++j)
          m.faces.push_back({idx[0], idx[j], idx[j + 1]});
      }
    } else {  // skip unknown scalar-only elements
      size_t stride = 0;
      for (const auto& p : e.props) {
        if (p.is_list)
          throw std::runtime_error(
              "list property on unknown element unsupported");
        stride += scalar_size(p.type);
      }
      need(stride * e.count);
      pos += stride * e.count;
    }
  }
  return m;
}

// Back-compat name (now handles ascii and binary).
inline Mesh load_ply_ascii(const std::string& path) { return load_ply(path); }

inline Mesh load_mesh(const std::string& path) {
  auto dot = path.rfind('.');
  std::string ext = dot == std::string::npos ? "" : path.substr(dot + 1);
  if (ext == "obj") return load_obj(path);
  if (ext == "ply") return load_ply(path);
  throw std::runtime_error("unsupported mesh format: " + path);
}
