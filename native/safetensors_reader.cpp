// Native safetensors reader: mmap + minimal JSON header parser, C ABI.
//
// The framework's weight-import layer reads .safetensors checkpoints
// (reference: load_into's attribute walk, 02_.../sd3_infer.py:20-44).
// This native reader maps the file once and serves zero-copy tensor views
// (header parse + IO off the GIL); Python binds via ctypes
// (from_ddpm_to_stable_diffusion_tpu/io/native.py::NativeSafetensors).
//
// Format: 8-byte LE u64 header length N, then N bytes of JSON
//   {"name": {"dtype": "F32", "shape": [..], "data_offsets": [b, e]}, ...}
// (optional "__metadata__" object of strings is skipped), then raw data;
// data_offsets are relative to the end of the header.

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

struct Tensor {
  std::string name;
  std::string dtype;
  std::vector<int64_t> shape;
  uint64_t begin = 0;  // absolute file offset
  uint64_t end = 0;
};

struct File {
  int fd = -1;
  uint8_t *map = nullptr;
  size_t size = 0;
  std::vector<Tensor> tensors;
  std::string error;
};

// ---- minimal JSON subset parser (objects/arrays/strings/ints) ----------
struct Parser {
  const char *p, *end;
  std::string err;

  void ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
  }
  bool expect(char c) {
    ws();
    if (p < end && *p == c) { ++p; return true; }
    err = std::string("expected '") + c + "'";
    return false;
  }
  bool peek(char c) {
    ws();
    return p < end && *p == c;
  }
  bool parse_string(std::string &out) {
    if (!expect('"')) return false;
    out.clear();
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) {
        ++p;
        switch (*p) {
          case 'n': out += '\n'; break;
          case 't': out += '\t'; break;
          case 'r': out += '\r'; break;
          case 'b': out += '\b'; break;
          case 'f': out += '\f'; break;
          case 'u': {
            if (p + 4 >= end) { err = "bad \\u"; return false; }
            unsigned code = 0;
            for (int i = 1; i <= 4; ++i) {
              char c = p[i];
              code <<= 4;
              if (c >= '0' && c <= '9') code |= c - '0';
              else if (c >= 'a' && c <= 'f') code |= c - 'a' + 10;
              else if (c >= 'A' && c <= 'F') code |= c - 'A' + 10;
              else { err = "bad \\u"; return false; }
            }
            p += 4;
            // UTF-8 encode (BMP only — tensor names in practice)
            if (code < 0x80) out += (char)code;
            else if (code < 0x800) {
              out += (char)(0xC0 | (code >> 6));
              out += (char)(0x80 | (code & 0x3F));
            } else {
              out += (char)(0xE0 | (code >> 12));
              out += (char)(0x80 | ((code >> 6) & 0x3F));
              out += (char)(0x80 | (code & 0x3F));
            }
            break;
          }
          default: out += *p;
        }
        ++p;
      } else {
        out += *p++;
      }
    }
    return expect('"');
  }
  bool parse_u64(uint64_t &out) {
    ws();
    if (p >= end || *p < '0' || *p > '9') { err = "expected int"; return false; }
    out = 0;
    while (p < end && *p >= '0' && *p <= '9') out = out * 10 + (*p++ - '0');
    return true;
  }
  // skip any value (for __metadata__)
  bool skip_value() {
    ws();
    if (p >= end) { err = "eof"; return false; }
    if (*p == '"') { std::string s; return parse_string(s); }
    if (*p == '{') {
      ++p;
      if (peek('}')) { ++p; return true; }
      while (true) {
        std::string k;
        if (!parse_string(k) || !expect(':') || !skip_value()) return false;
        if (peek(',')) { ++p; continue; }
        return expect('}');
      }
    }
    if (*p == '[') {
      ++p;
      if (peek(']')) { ++p; return true; }
      while (true) {
        if (!skip_value()) return false;
        if (peek(',')) { ++p; continue; }
        return expect(']');
      }
    }
    // number / true / false / null
    while (p < end && *p != ',' && *p != '}' && *p != ']' && *p != ' ' &&
           *p != '\n' && *p != '\t' && *p != '\r')
      ++p;
    return true;
  }
};

bool parse_header(File *f, const char *json, size_t n, uint64_t data_base) {
  Parser ps{json, json + n};
  if (!ps.expect('{')) { f->error = ps.err; return false; }
  if (ps.peek('}')) return true;
  while (true) {
    std::string name;
    if (!ps.parse_string(name) || !ps.expect(':')) {
      f->error = ps.err; return false;
    }
    if (name == "__metadata__") {
      if (!ps.skip_value()) { f->error = ps.err; return false; }
    } else {
      Tensor t;
      t.name = name;
      if (!ps.expect('{')) { f->error = ps.err; return false; }
      while (true) {
        std::string key;
        if (!ps.parse_string(key) || !ps.expect(':')) {
          f->error = ps.err; return false;
        }
        if (key == "dtype") {
          if (!ps.parse_string(t.dtype)) { f->error = ps.err; return false; }
        } else if (key == "shape") {
          if (!ps.expect('[')) { f->error = ps.err; return false; }
          if (!ps.peek(']')) {
            while (true) {
              uint64_t v;
              if (!ps.parse_u64(v)) { f->error = ps.err; return false; }
              t.shape.push_back((int64_t)v);
              if (ps.peek(',')) { ++ps.p; continue; }
              break;
            }
          }
          if (!ps.expect(']')) { f->error = ps.err; return false; }
        } else if (key == "data_offsets") {
          uint64_t b, e;
          if (!ps.expect('[') || !ps.parse_u64(b) || !ps.expect(',') ||
              !ps.parse_u64(e) || !ps.expect(']')) {
            f->error = ps.err; return false;
          }
          t.begin = data_base + b;
          t.end = data_base + e;
        } else {
          if (!ps.skip_value()) { f->error = ps.err; return false; }
        }
        if (ps.peek(',')) { ++ps.p; continue; }
        break;
      }
      if (!ps.expect('}')) { f->error = ps.err; return false; }
      if (t.end > f->size || t.begin > t.end) {
        f->error = "tensor '" + t.name + "' offsets out of range";
        return false;
      }
      f->tensors.push_back(std::move(t));
    }
    if (ps.peek(',')) { ++ps.p; continue; }
    break;
  }
  if (!ps.expect('}')) { f->error = ps.err; return false; }
  return true;
}

}  // namespace

extern "C" {

void *st_open(const char *path) {
  File *f = new File();
  f->fd = ::open(path, O_RDONLY);
  if (f->fd < 0) { f->error = "open failed"; return f; }
  struct stat st;
  if (fstat(f->fd, &st) != 0 || st.st_size < 8) {
    f->error = "stat failed or file too small";
    return f;
  }
  f->size = (size_t)st.st_size;
  f->map = (uint8_t *)mmap(nullptr, f->size, PROT_READ, MAP_PRIVATE,
                           f->fd, 0);
  if (f->map == MAP_FAILED) { f->map = nullptr; f->error = "mmap failed"; return f; }
  uint64_t hlen;
  std::memcpy(&hlen, f->map, 8);  // little-endian hosts only (x86/ARM)
  if (hlen > f->size - 8) {  // guard phrased to avoid unsigned overflow
    f->error = "header length out of range";
    return f;
  }
  parse_header(f, (const char *)f->map + 8, (size_t)hlen, 8 + hlen);
  return f;
}

const char *st_error(void *h) {
  File *f = (File *)h;
  return f->error.empty() ? nullptr : f->error.c_str();
}

int64_t st_count(void *h) { return (int64_t)((File *)h)->tensors.size(); }

const char *st_name(void *h, int64_t i) {
  return ((File *)h)->tensors[i].name.c_str();
}

const char *st_dtype(void *h, int64_t i) {
  return ((File *)h)->tensors[i].dtype.c_str();
}

int64_t st_ndim(void *h, int64_t i) {
  return (int64_t)((File *)h)->tensors[i].shape.size();
}

void st_shape(void *h, int64_t i, int64_t *out) {
  const Tensor &t = ((File *)h)->tensors[i];
  for (size_t d = 0; d < t.shape.size(); ++d) out[d] = t.shape[d];
}

int64_t st_nbytes(void *h, int64_t i) {
  const Tensor &t = ((File *)h)->tensors[i];
  return (int64_t)(t.end - t.begin);
}

const void *st_data(void *h, int64_t i) {
  File *f = (File *)h;
  return f->map + f->tensors[i].begin;
}

void st_close(void *h) {
  File *f = (File *)h;
  if (f->map) munmap(f->map, f->size);
  if (f->fd >= 0) ::close(f->fd);
  delete f;
}

}  // extern "C"
