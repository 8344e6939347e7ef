// Native byte-level BPE tokenizer (CLIP convention).
//
// C++ implementation of the host-side tokenization hot path — the
// counterpart of io/tokenizer.py's pure-Python encoder (itself a behavioral
// re-implementation of the reference's from-scratch BPE,
// 01_stable_diffusion-1/stable_diffusion_pytorch/tokenizer.py:29-90).
// Exposed through a minimal C ABI consumed via ctypes (no pybind11 in this
// environment). One tokenizer instance is immutable after load and safe for
// concurrent encode() calls from multiple threads.
//
// Algorithm parity with the Python side (tested against it):
//   NFC-normalized*, lowercased, whitespace-collapsed text → regex-free
//   greedy chunker (contractions / letters / digits / punctuation) →
//   byte→printable-unicode remap → lowest-rank-first pair merging with
//   </w> end-of-word marker → BOS/EOS + pad to max_length.
//   (*) NFC normalization is expected to be done by the caller for exotic
//   inputs; ASCII and already-composed UTF-8 pass through unchanged.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC bpe_tokenizer.cpp -o libbpe.so

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// byte → printable-unicode table (GPT-2/CLIP convention)
// ---------------------------------------------------------------------------
// Python: bytes with unicodedata category C* or Z* are displaced to 256+.
// For the byte range this is exactly: 0x00-0x20, 0x7F-0xA0, 0xAD.
std::vector<std::string> build_bytes_table() {
  std::vector<std::string> table(256);
  int special = 0;
  auto encode_cp = [](int cp) {
    std::string out;
    if (cp < 0x80) {
      out.push_back(static_cast<char>(cp));
    } else if (cp < 0x800) {
      out.push_back(static_cast<char>(0xC0 | (cp >> 6)));
      out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
    } else {
      out.push_back(static_cast<char>(0xE0 | (cp >> 12)));
      out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
      out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
    }
    return out;
  };
  for (int b = 0; b < 256; ++b) {
    bool control_or_space =
        (b <= 0x20) || (b >= 0x7F && b <= 0xA0) || (b == 0xAD);
    if (!control_or_space) {
      table[b] = encode_cp(b);
    } else {
      table[b] = encode_cp(256 + special);
      ++special;
    }
  }
  return table;
}

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& p) const {
    return std::hash<std::string>()(p.first) * 1000003 ^
           std::hash<std::string>()(p.second);
  }
};

struct Tokenizer {
  std::unordered_map<std::string, int64_t> vocab;
  std::unordered_map<std::pair<std::string, std::string>, int64_t, PairHash>
      merges;
  std::vector<std::string> bytes_table;
  int64_t bos_id = 0, eos_id = 0, pad_id = 0;
  int max_length = 77;
};

// minimal parser for a flat {"token": id, ...} JSON object
bool parse_vocab_json(const std::string& path,
                      std::unordered_map<std::string, int64_t>* out) {
  std::ifstream f(path);
  if (!f) return false;
  std::stringstream ss;
  ss << f.rdbuf();
  const std::string s = ss.str();
  size_t i = 0;
  auto skip_ws = [&] { while (i < s.size() && std::isspace((unsigned char)s[i])) ++i; };
  skip_ws();
  if (i >= s.size() || s[i] != '{') return false;
  ++i;
  while (true) {
    skip_ws();
    if (i < s.size() && s[i] == '}') return true;
    if (i >= s.size() || s[i] != '"') return false;
    ++i;
    std::string key;
    while (i < s.size() && s[i] != '"') {
      if (s[i] == '\\' && i + 1 < s.size()) {
        ++i;
        char c = s[i];
        switch (c) {
          case 'n': key.push_back('\n'); break;
          case 't': key.push_back('\t'); break;
          case 'r': key.push_back('\r'); break;
          case 'b': key.push_back('\b'); break;
          case 'f': key.push_back('\f'); break;
          case 'u': {
            if (i + 4 < s.size()) {
              int cp = std::stoi(s.substr(i + 1, 4), nullptr, 16);
              // encode cp as UTF-8
              if (cp < 0x80) key.push_back((char)cp);
              else if (cp < 0x800) {
                key.push_back((char)(0xC0 | (cp >> 6)));
                key.push_back((char)(0x80 | (cp & 0x3F)));
              } else {
                key.push_back((char)(0xE0 | (cp >> 12)));
                key.push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
                key.push_back((char)(0x80 | (cp & 0x3F)));
              }
              i += 4;
            }
            break;
          }
          default: key.push_back(c);
        }
      } else {
        key.push_back(s[i]);
      }
      ++i;
    }
    ++i;  // closing quote
    skip_ws();
    if (i >= s.size() || s[i] != ':') return false;
    ++i;
    skip_ws();
    size_t j = i;
    while (j < s.size() && (std::isdigit((unsigned char)s[j]) || s[j] == '-'))
      ++j;
    (*out)[key] = std::stoll(s.substr(i, j - i));
    i = j;
    skip_ws();
    if (i < s.size() && s[i] == ',') { ++i; continue; }
    if (i < s.size() && s[i] == '}') return true;
    return false;
  }
}

// chunker mirroring the CLIP regex:
//   <|startoftext|> | <|endoftext|> | 's 't 're 've 'm 'll 'd
//   | [letters]+ | [digit] | [^ws letters digits]+
bool is_letter(unsigned char c) { return std::isalpha(c) || c >= 0x80; }

std::vector<std::string> chunk_text(const std::string& text) {
  std::vector<std::string> chunks;
  size_t i = 0;
  const size_t n = text.size();
  auto starts_with = [&](const char* s) {
    size_t len = std::strlen(s);
    return n - i >= len && std::memcmp(text.data() + i, s, len) == 0;
  };
  while (i < n) {
    unsigned char c = text[i];
    if (std::isspace(c)) { ++i; continue; }
    if (starts_with("<|startoftext|>")) { chunks.emplace_back("<|startoftext|>"); i += 15; continue; }
    if (starts_with("<|endoftext|>")) { chunks.emplace_back("<|endoftext|>"); i += 13; continue; }
    if (c == '\'') {
      static const char* contractions[] = {"'s", "'t", "'re", "'ve", "'m", "'ll", "'d"};
      bool matched = false;
      // longest-first so 're / 'll / 've beat the single-letter forms
      for (const char* suf : {"'re", "'ve", "'ll", "'s", "'t", "'m", "'d"}) {
        size_t len = std::strlen(suf);
        if (n - i >= len && std::memcmp(text.data() + i, suf, len) == 0) {
          // following char must not be a letter (regex would not match inside a word)
          chunks.emplace_back(text.substr(i, len));
          i += len;
          matched = true;
          break;
        }
      }
      (void)contractions;
      if (matched) continue;
    }
    if (is_letter(c)) {
      size_t j = i;
      while (j < n && is_letter((unsigned char)text[j])) ++j;
      chunks.emplace_back(text.substr(i, j - i));
      i = j;
      continue;
    }
    if (std::isdigit(c)) {  // single digit per chunk
      chunks.emplace_back(text.substr(i, 1));
      ++i;
      continue;
    }
    // punctuation run (no whitespace/letters/digits)
    size_t j = i;
    while (j < n) {
      unsigned char cj = text[j];
      if (std::isspace(cj) || is_letter(cj) || std::isdigit(cj)) break;
      if (text.compare(j, 15, "<|startoftext|>") == 0) break;
      if (text.compare(j, 13, "<|endoftext|>") == 0) break;
      ++j;
    }
    chunks.emplace_back(text.substr(i, j - i));
    i = j;
  }
  return chunks;
}

// split a UTF-8 string into code-point strings
std::vector<std::string> utf8_chars(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    unsigned char c = s[i];
    size_t len = c < 0x80 ? 1 : c < 0xE0 ? 2 : c < 0xF0 ? 3 : 4;
    out.push_back(s.substr(i, len));
    i += len;
  }
  return out;
}

std::vector<std::string> bpe(const Tokenizer& tok, const std::string& chunk) {
  std::vector<std::string> parts = utf8_chars(chunk);
  if (parts.empty()) return parts;
  parts.back() += "</w>";
  while (parts.size() > 1) {
    int64_t best = INT64_MAX;
    for (size_t i = 0; i + 1 < parts.size(); ++i) {
      auto it = tok.merges.find({parts[i], parts[i + 1]});
      if (it != tok.merges.end() && it->second < best) best = it->second;
    }
    if (best == INT64_MAX) break;
    std::vector<std::string> merged;
    merged.reserve(parts.size());
    for (size_t i = 0; i < parts.size();) {
      if (i + 1 < parts.size()) {
        auto it = tok.merges.find({parts[i], parts[i + 1]});
        if (it != tok.merges.end() && it->second == best) {
          merged.push_back(parts[i] + parts[i + 1]);
          i += 2;
          continue;
        }
      }
      merged.push_back(parts[i]);
      ++i;
    }
    parts.swap(merged);
  }
  return parts;
}

}  // namespace

extern "C" {

void* bpe_create(const char* vocab_path, const char* merges_path,
                 int max_length) {
  auto* tok = new Tokenizer();
  tok->max_length = max_length;
  tok->bytes_table = build_bytes_table();
  if (!parse_vocab_json(vocab_path, &tok->vocab)) {
    delete tok;
    return nullptr;
  }
  std::ifstream mf(merges_path);
  if (!mf) {
    delete tok;
    return nullptr;
  }
  std::string line;
  std::getline(mf, line);  // header
  int64_t rank = 0;
  while (std::getline(mf, line)) {
    if (line.empty()) continue;
    size_t sp = line.find(' ');
    if (sp == std::string::npos) continue;
    tok->merges[{line.substr(0, sp), line.substr(sp + 1)}] = rank++;
  }
  auto bos = tok->vocab.find("<|startoftext|>");
  auto eos = tok->vocab.find("<|endoftext|>");
  if (bos == tok->vocab.end() || eos == tok->vocab.end()) {
    delete tok;
    return nullptr;
  }
  tok->bos_id = bos->second;
  tok->eos_id = eos->second;
  tok->pad_id = eos->second;
  return tok;
}

void bpe_destroy(void* handle) { delete static_cast<Tokenizer*>(handle); }

// Encode text into out_ids (caller-allocated, max_length entries).
// Returns the unpadded token count (<= max_length), or -1 on unknown token.
int bpe_encode(void* handle, const char* text, int64_t* out_ids) {
  const auto& tok = *static_cast<Tokenizer*>(handle);
  // lowercase + whitespace collapse
  std::string norm;
  norm.reserve(std::strlen(text));
  bool prev_space = true;
  for (const char* p = text; *p; ++p) {
    unsigned char c = *p;
    if (std::isspace(c)) {
      if (!prev_space) norm.push_back(' ');
      prev_space = true;
    } else {
      norm.push_back(c < 0x80 ? std::tolower(c) : c);
      prev_space = false;
    }
  }
  while (!norm.empty() && norm.back() == ' ') norm.pop_back();

  std::vector<int64_t> ids;
  ids.push_back(tok.bos_id);
  for (const auto& chunk : chunk_text(norm)) {
    std::string mapped;
    for (unsigned char b : chunk) mapped += tok.bytes_table[b];
    for (const auto& piece : bpe(tok, mapped)) {
      auto it = tok.vocab.find(piece);
      if (it == tok.vocab.end()) return -1;
      ids.push_back(it->second);
    }
  }
  ids.push_back(tok.eos_id);
  if ((int)ids.size() > tok.max_length) ids.resize(tok.max_length);
  int count = (int)ids.size();
  for (int i = 0; i < tok.max_length; ++i)
    out_ids[i] = i < count ? ids[i] : tok.pad_id;
  return count;
}

int64_t bpe_vocab_size(void* handle) {
  return static_cast<Tokenizer*>(handle)->vocab.size();
}

}  // extern "C"
