// Minimal .npy / .npz (stored, uncompressed zip) writers for float32
// arrays — enough to emit the SDF sample sets the data layer consumes
// (pos/neg [N,4] arrays; see data/sdf_dataset.py contract).
#pragma once
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace npy {

inline std::string header_f32(const std::vector<size_t>& shape) {
  std::string dict = "{'descr': '<f4', 'fortran_order': False, 'shape': (";
  for (size_t i = 0; i < shape.size(); ++i) {
    dict += std::to_string(shape[i]);
    dict += (shape.size() == 1 || i + 1 < shape.size()) ? "," : "";
    if (i + 1 < shape.size()) dict += " ";
  }
  dict += "), }";
  size_t total = 10 + dict.size() + 1;  // magic+ver+len + dict + newline
  size_t pad = (64 - total % 64) % 64;
  dict += std::string(pad, ' ');
  dict += '\n';
  std::string h = "\x93NUMPY";
  h += '\x01';
  h += '\x00';
  uint16_t hlen = static_cast<uint16_t>(dict.size());
  h.append(reinterpret_cast<const char*>(&hlen), 2);
  h += dict;
  return h;
}

inline std::string npy_bytes_f32(const float* data,
                                 const std::vector<size_t>& shape) {
  std::string out = header_f32(shape);
  size_t n = 1;
  for (size_t s : shape) n *= s;
  out.append(reinterpret_cast<const char*>(data), n * sizeof(float));
  return out;
}

// --- CRC-32 (IEEE 802.3), table-driven ---
inline uint32_t crc32(const uint8_t* buf, size_t len) {
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k)
        c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      table[i] = c;
    }
    init = true;
  }
  uint32_t c = 0xFFFFFFFFu;
  for (size_t i = 0; i < len; ++i) c = table[(c ^ buf[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

struct ZipWriter {
  // Uncompressed ("stored") zip — exactly what np.savez produces.
  explicit ZipWriter(const std::string& path) : f_(fopen(path.c_str(), "wb")) {}
  ~ZipWriter() {
    if (f_) finish();
  }

  void add(const std::string& name, const std::string& bytes) {
    Entry e;
    e.name = name;
    e.crc = crc32(reinterpret_cast<const uint8_t*>(bytes.data()),
                  bytes.size());
    e.size = bytes.size();
    e.offset = ftell(f_);
    // local file header
    put32(0x04034b50);
    put16(20);      // version needed
    put16(0);       // flags
    put16(0);       // method: stored
    put16(0);       // mod time
    put16(0);       // mod date
    put32(e.crc);
    put32(static_cast<uint32_t>(e.size));
    put32(static_cast<uint32_t>(e.size));
    put16(static_cast<uint16_t>(name.size()));
    put16(0);       // extra len
    fwrite(name.data(), 1, name.size(), f_);
    fwrite(bytes.data(), 1, bytes.size(), f_);
    entries_.push_back(e);
  }

  void finish() {
    long cd_start = ftell(f_);
    for (const Entry& e : entries_) {
      put32(0x02014b50);
      put16(20);
      put16(20);
      put16(0);
      put16(0);
      put16(0);
      put16(0);
      put32(e.crc);
      put32(static_cast<uint32_t>(e.size));
      put32(static_cast<uint32_t>(e.size));
      put16(static_cast<uint16_t>(e.name.size()));
      put16(0);
      put16(0);
      put16(0);
      put16(0);
      put32(0);
      put32(static_cast<uint32_t>(e.offset));
      fwrite(e.name.data(), 1, e.name.size(), f_);
    }
    long cd_end = ftell(f_);
    put32(0x06054b50);
    put16(0);
    put16(0);
    put16(static_cast<uint16_t>(entries_.size()));
    put16(static_cast<uint16_t>(entries_.size()));
    put32(static_cast<uint32_t>(cd_end - cd_start));
    put32(static_cast<uint32_t>(cd_start));
    put16(0);
    fclose(f_);
    f_ = nullptr;
  }

 private:
  struct Entry {
    std::string name;
    uint32_t crc;
    size_t size;
    long offset;
  };
  void put16(uint16_t v) { fwrite(&v, 2, 1, f_); }
  void put32(uint32_t v) { fwrite(&v, 4, 1, f_); }
  FILE* f_;
  std::vector<Entry> entries_;
};

inline void save_npz_f32(const std::string& path,
                         const std::vector<std::pair<std::string,
                             std::pair<const float*, std::vector<size_t>>>>&
                             arrays) {
  ZipWriter zw(path);
  for (const auto& kv : arrays)
    zw.add(kv.first + ".npy",
           npy_bytes_f32(kv.second.first, kv.second.second));
  zw.finish();
}

}  // namespace npy
