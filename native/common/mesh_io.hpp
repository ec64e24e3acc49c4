// ASCII OBJ / PLY triangle-mesh loading (fan-triangulates polygons).
#pragma once
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
      while (ss >> tok) {
        idx.push_back(std::stoi(tok.substr(0, tok.find('/'))) - 1);
      }
      for (size_t k = 1; k + 1 < idx.size(); ++k)
        m.faces.push_back({idx[0], idx[k], idx[k + 1]});
    }
  }
  return m;
}

inline Mesh load_ply_ascii(const std::string& path) {
  std::ifstream in(path);
  if (!in) throw std::runtime_error("cannot open " + path);
  std::string line;
  size_t n_v = 0, n_f = 0;
  int xyz_props = 0;
  bool in_vertex_element = false;
  while (std::getline(in, line)) {
    std::istringstream ss(line);
    std::string tag;
    ss >> tag;
    if (tag == "format") {
      std::string fmt;
      ss >> fmt;
      if (fmt != "ascii")
        throw std::runtime_error("only ascii PLY supported");
    } else if (tag == "element") {
      std::string what;
      ss >> what;
      in_vertex_element = (what == "vertex");
      if (what == "vertex") ss >> n_v;
      if (what == "face") ss >> n_f;
    } else if (tag == "property" && in_vertex_element) {
      ++xyz_props;
    } else if (tag == "end_header") {
      break;
    }
  }
  Mesh m;
  m.verts.reserve(n_v);
  for (size_t i = 0; i < n_v; ++i) {
    std::getline(in, line);
    std::istringstream ss(line);
    Vec3 v;
    ss >> v.x >> v.y >> v.z;
    m.verts.push_back(v);
  }
  for (size_t i = 0; i < n_f; ++i) {
    std::getline(in, line);
    std::istringstream ss(line);
    int k;
    ss >> k;
    std::vector<int> idx(k);
    for (int j = 0; j < k; ++j) ss >> idx[j];
    for (int j = 1; j + 1 < k; ++j)
      m.faces.push_back({idx[0], idx[j], idx[j + 1]});
  }
  return m;
}

inline Mesh load_mesh(const std::string& path) {
  auto dot = path.rfind('.');
  std::string ext = dot == std::string::npos ? "" : path.substr(dot + 1);
  if (ext == "obj") return load_obj(path);
  if (ext == "ply") return load_ply_ascii(path);
  throw std::runtime_error("unsupported mesh format: " + path);
}
