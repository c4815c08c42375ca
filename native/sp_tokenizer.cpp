// Native SentencePiece-compatible tokenizer (C++17, no dependencies).
//
// The reference depends on the sentencepiece C++ wheel for tokenization; this
// is the framework's first-party equivalent: parses standard `.model` protobuf
// files (wire format directly), normalizes text, and encodes with unigram
// Viterbi (or greedy BPE merges for BPE models). Exposed through a minimal
// C ABI consumed via ctypes (pocket_tts_tpu/text/native.py); the pure-Python
// implementation in pocket_tts_tpu/text/sentencepiece.py is the fallback and
// the behavioral spec — the parity test drives both on the same models.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>
#include <fstream>
#include <limits>
#include <algorithm>

namespace {

constexpr int kNormal = 1, kUnknown = 2, kControl = 3, kUserDefined = 4,
              kUnused = 5, kByte = 6;
const std::string kSpace = "\xe2\x96\x81";  // U+2581

struct Piece {
  std::string text;
  float score = 0.f;
  int type = kNormal;
};

struct Model {
  std::vector<Piece> pieces;
  std::unordered_map<std::string, int> index;
  int byte_pieces[256];
  bool has_bytes = false;
  int model_type = 1;  // 1=unigram 2=bpe
  int unk_id = 0;
  bool add_dummy_prefix = true;
  bool remove_extra_whitespaces = true;
  bool escape_whitespaces = true;
  size_t max_piece_len = 1;
  float min_score = 0.f;
};

struct Reader {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  uint64_t varint() {
    uint64_t result = 0;
    int shift = 0;
    while (p < end) {
      uint8_t b = *p++;
      result |= uint64_t(b & 0x7f) << shift;
      if (!(b & 0x80)) return result;
      shift += 7;
    }
    ok = false;
    return result;
  }
};

void parse_piece(Reader r, Model& m) {
  Piece piece;
  while (r.ok && r.p < r.end) {
    uint64_t tag = r.varint();
    int fnum = int(tag >> 3), wtype = int(tag & 7);
    if (wtype == 2) {
      uint64_t len = r.varint();
      if (fnum == 1) piece.text.assign(reinterpret_cast<const char*>(r.p), len);
      r.p += len;
    } else if (wtype == 5) {
      if (fnum == 2) std::memcpy(&piece.score, r.p, 4);
      r.p += 4;
    } else if (wtype == 0) {
      uint64_t v = r.varint();
      if (fnum == 3) piece.type = int(v);
    } else if (wtype == 1) {
      r.p += 8;
    } else {
      return;
    }
  }
  m.pieces.push_back(std::move(piece));
}

void parse_submessage(Reader r, Model& m, int parent) {
  while (r.ok && r.p < r.end) {
    uint64_t tag = r.varint();
    int fnum = int(tag >> 3), wtype = int(tag & 7);
    if (wtype == 0) {
      uint64_t v = r.varint();
      if (parent == 2 && fnum == 3) m.model_type = int(v);
      if (parent == 2 && fnum == 40) m.unk_id = int(v);
      if (parent == 3 && fnum == 2) m.add_dummy_prefix = v != 0;
      if (parent == 3 && fnum == 4) m.remove_extra_whitespaces = v != 0;
      if (parent == 3 && fnum == 5) m.escape_whitespaces = v != 0;
    } else if (wtype == 2) {
      uint64_t len = r.varint();
      r.p += len;
    } else if (wtype == 5) {
      r.p += 4;
    } else if (wtype == 1) {
      r.p += 8;
    } else {
      return;
    }
  }
}

Model* parse_model(const uint8_t* data, size_t size) {
  auto* m = new Model();
  Reader r{data, data + size};
  while (r.ok && r.p < r.end) {
    uint64_t tag = r.varint();
    int fnum = int(tag >> 3), wtype = int(tag & 7);
    if (wtype == 2) {
      uint64_t len = r.varint();
      Reader sub{r.p, r.p + len};
      if (fnum == 1) parse_piece(sub, *m);
      else if (fnum == 2 || fnum == 3) parse_submessage(sub, *m, fnum);
      r.p += len;
    } else if (wtype == 0) {
      r.varint();
    } else if (wtype == 5) {
      r.p += 4;
    } else if (wtype == 1) {
      r.p += 8;
    } else {
      break;
    }
  }
  m->min_score = 0.f;
  std::fill(std::begin(m->byte_pieces), std::end(m->byte_pieces), -1);
  for (int i = 0; i < int(m->pieces.size()); ++i) {
    const Piece& p = m->pieces[i];
    if ((p.type == kNormal || p.type == kUserDefined) && !m->index.count(p.text))
      m->index.emplace(p.text, i);
    if (p.type == kByte && p.text.size() == 6) {
      int b = std::stoi(p.text.substr(3, 2), nullptr, 16);
      m->byte_pieces[b] = i;
      m->has_bytes = true;
    }
    m->max_piece_len = std::max(m->max_piece_len, p.text.size());
    m->min_score = std::min(m->min_score, p.score);
  }
  return m;
}

std::string normalize(const Model& m, const std::string& text) {
  std::string out;
  if (m.remove_extra_whitespaces) {
    std::string collapsed;
    bool prev_space = false, started = false;
    for (char c : text) {
      if (c == ' ') {
        prev_space = true;
      } else {
        if (prev_space && started) collapsed += ' ';
        collapsed += c;
        prev_space = false;
        started = true;
      }
    }
    out = collapsed;
  } else {
    out = text;
  }
  if (m.add_dummy_prefix) out = " " + out;
  if (m.escape_whitespaces) {
    std::string esc;
    esc.reserve(out.size() * 2);
    for (char c : out) {
      if (c == ' ') esc += kSpace;
      else esc += c;
    }
    out = esc;
  }
  return out;
}

void emit_bytes_or_unk(const Model& m, const std::string& seg,
                       std::vector<int>& ids) {
  if (m.has_bytes) {
    for (unsigned char b : seg) ids.push_back(m.byte_pieces[b]);
  } else {
    ids.push_back(m.unk_id);
  }
}

std::vector<int> encode_unigram(const Model& m, const std::string& text) {
  const size_t n = text.size();
  const float NEG = -std::numeric_limits<float>::infinity();
  std::vector<float> best(n + 1, NEG);
  std::vector<std::pair<int, int>> back(n + 1, {-1, -2});  // (start, piece or -1)
  best[0] = 0.f;
  const float unk_penalty = m.min_score - 10.f;
  for (size_t i = 0; i < n; ++i) {
    if (best[i] == NEG) continue;
    size_t limit = std::min(n, i + m.max_piece_len);
    bool matched = false;
    for (size_t j = i + 1; j <= limit; ++j) {
      auto it = m.index.find(text.substr(i, j - i));
      if (it == m.index.end()) continue;
      matched = true;
      float s = best[i] + m.pieces[it->second].score;
      if (s > best[j]) {
        best[j] = s;
        back[j] = {int(i), it->second};
      }
    }
    if (!matched || back[i + 1].second == -2) {
      float s = best[i] + unk_penalty;
      if (s > best[i + 1]) {
        best[i + 1] = s;
        back[i + 1] = {int(i), -1};
      }
    }
  }
  std::vector<int> ids;
  size_t j = n;
  std::vector<int> rev;
  while (j > 0) {
    auto [i, pid] = back[j];
    if (pid == -1) {
      std::vector<int> b;
      std::string seg = text.substr(i, j - i);
      std::vector<int> tmp;
      emit_bytes_or_unk(m, seg, tmp);
      for (auto it = tmp.rbegin(); it != tmp.rend(); ++it) rev.push_back(*it);
    } else {
      rev.push_back(pid);
    }
    j = size_t(i);
  }
  ids.assign(rev.rbegin(), rev.rend());
  return ids;
}

std::vector<int> encode_bpe(const Model& m, const std::string& text) {
  // split into UTF-8 code points
  std::vector<std::string> symbols;
  for (size_t i = 0; i < text.size();) {
    unsigned char c = text[i];
    size_t len = c < 0x80 ? 1 : c < 0xE0 ? 2 : c < 0xF0 ? 3 : 4;
    symbols.push_back(text.substr(i, len));
    i += len;
  }
  while (true) {
    float best_score = -std::numeric_limits<float>::infinity();
    int best_i = -1;
    for (int i = 0; i + 1 < int(symbols.size()); ++i) {
      auto it = m.index.find(symbols[i] + symbols[i + 1]);
      if (it != m.index.end() && m.pieces[it->second].score > best_score) {
        best_score = m.pieces[it->second].score;
        best_i = i;
      }
    }
    if (best_i < 0) break;
    symbols[best_i] += symbols[best_i + 1];
    symbols.erase(symbols.begin() + best_i + 1);
  }
  std::vector<int> ids;
  for (const auto& sym : symbols) {
    auto it = m.index.find(sym);
    if (it == m.index.end()) emit_bytes_or_unk(m, sym, ids);
    else ids.push_back(it->second);
  }
  return ids;
}

std::string decode_ids(const Model& m, const int* ids, int n) {
  std::string out;
  std::string byte_buf;
  auto flush = [&]() {
    out += byte_buf;
    byte_buf.clear();
  };
  for (int i = 0; i < n; ++i) {
    if (ids[i] < 0 || ids[i] >= int(m.pieces.size())) continue;
    const Piece& p = m.pieces[ids[i]];
    if (p.type == kByte && p.text.size() == 6) {
      byte_buf += char(std::stoi(p.text.substr(3, 2), nullptr, 16));
      continue;
    }
    flush();
    if (p.type == kControl || p.type == kUnused) continue;
    if (p.type == kUnknown) {
      out += " \xe2\x81\x87 ";
      continue;
    }
    out += p.text;
  }
  flush();
  // unescape: U+2581 -> space; strip single leading space
  std::string final_out;
  for (size_t i = 0; i < out.size();) {
    if (out.compare(i, 3, kSpace) == 0) {
      final_out += ' ';
      i += 3;
    } else {
      final_out += out[i++];
    }
  }
  if (!final_out.empty() && final_out[0] == ' ') final_out.erase(0, 1);
  return final_out;
}

}  // namespace

extern "C" {

void* sp_load(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return nullptr;
  std::vector<uint8_t> data((std::istreambuf_iterator<char>(f)),
                            std::istreambuf_iterator<char>());
  return parse_model(data.data(), data.size());
}

int sp_vocab_size(void* model) {
  return int(static_cast<Model*>(model)->pieces.size());
}

// Returns the number of ids (<= max_out are written to out_ids).
int sp_encode(void* model, const char* text, int* out_ids, int max_out) {
  Model& m = *static_cast<Model*>(model);
  std::string norm = normalize(m, text);
  if (norm.empty()) return 0;
  std::vector<int> ids =
      m.model_type == 2 ? encode_bpe(m, norm) : encode_unigram(m, norm);
  int n = int(ids.size());
  for (int i = 0; i < std::min(n, max_out); ++i) out_ids[i] = ids[i];
  return n;
}

// Returns the length of the decoded utf-8 string (<= max_len bytes written).
int sp_decode(void* model, const int* ids, int n, char* out, int max_len) {
  Model& m = *static_cast<Model*>(model);
  std::string s = decode_ids(m, ids, n);
  int len = int(s.size());
  std::memcpy(out, s.data(), std::min(len, max_len));
  return len;
}

void sp_free(void* model) { delete static_cast<Model*>(model); }

}  // extern "C"
