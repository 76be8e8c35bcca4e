// Copyright 2026.
//
// Licensed under the Apache License, Version 2.0 (the "License");
// you may not use this file except in compliance with the License.
// You may obtain a copy of the License at
//
//     http://www.apache.org/licenses/LICENSE-2.0
//
// CTC prefix beam search with ARPA n-gram scoring — the native decode path.
//
// Replaces the reference's ctcdecode C++ dependency (SURVEY §2.4;
// /root/reference/nnet/decoders.py:185-207): prefix beam search over
// (T, V) log-probs, KenLM-style backoff scoring of an ARPA 6-gram whose
// vocabulary is the chr(idx + offset) token remapping (decoders.py:187),
// alpha/beta combination identical to avec_tpu/decode/beam.py (the Python
// fallback implements the same algorithm; golden tests assert they agree).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <memory>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kNegInf = -std::numeric_limits<double>::infinity();
constexpr double kLn10 = 2.302585092994046;

inline double LogSumExp2(double a, double b) {
  if (a == kNegInf) return b;
  if (b == kNegInf) return a;
  double m = a > b ? a : b;
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

// UTF-8 encoding of a unicode codepoint (token id + offset), matching
// Python's chr().
std::string CodepointUtf8(int cp) {
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
}

// --------------------------------------------------------------------------
// ARPA backoff LM. N-grams keyed by joined word strings (words are
// single-codepoint UTF-8 tokens, so concatenation is unambiguous).
// --------------------------------------------------------------------------
class ArpaLM {
 public:
  explicit ArpaLM(const std::string& path) {
    std::ifstream f(path);
    if (!f) throw std::runtime_error("cannot open " + path);
    std::string line;
    int section = 0;
    while (std::getline(f, line)) {
      // Trim CR / whitespace.
      while (!line.empty() && (line.back() == '\r' || line.back() == ' '))
        line.pop_back();
      if (line.empty()) continue;
      if (line[0] == '\\') {
        auto g = line.find("-grams:");
        if (g != std::string::npos) {
          section = std::stoi(line.substr(1, g - 1));
          if (section > order_) order_ = section;
        } else {
          section = 0;
        }
        continue;
      }
      if (section == 0) continue;
      std::istringstream ss(line);
      double logp;
      if (!(ss >> logp)) continue;
      std::vector<std::string> words(section);
      for (int i = 0; i < section; ++i) ss >> words[i];
      double backoff = 0.0;
      bool has_backoff = static_cast<bool>(ss >> backoff);
      std::string key = Join(words);
      probs_[key] = logp;
      if (has_backoff) backoffs_[key] = backoff;
    }
  }

  int order() const { return order_; }

  // log10 P(word | history) with Katz backoff.
  double Log10Cond(const std::vector<std::string>& history,
                   const std::string& word) const {
    size_t start = history.size() > static_cast<size_t>(order_ - 1)
                       ? history.size() - (order_ - 1)
                       : 0;
    std::vector<std::string> h(history.begin() + start, history.end());
    double bo_sum = 0.0;
    while (true) {
      std::vector<std::string> ngram = h;
      ngram.push_back(word);
      auto it = probs_.find(Join(ngram));
      if (it != probs_.end()) return bo_sum + it->second;
      if (h.empty()) return bo_sum - 99.0;  // unseen unigram
      auto bo = backoffs_.find(Join(h));
      if (bo != backoffs_.end()) bo_sum += bo->second;
      h.erase(h.begin());
    }
  }

 private:
  static std::string Join(const std::vector<std::string>& words) {
    std::string out;
    for (size_t i = 0; i < words.size(); ++i) {
      if (i) out.push_back(' ');
      out += words[i];
    }
    return out;
  }

  std::unordered_map<std::string, double> probs_;
  std::unordered_map<std::string, double> backoffs_;
  int order_ = 0;
};

// --------------------------------------------------------------------------
// Prefix beam search.
// --------------------------------------------------------------------------
struct BeamState {
  double p_blank = kNegInf;
  double p_non_blank = kNegInf;
  double lm_score = 0.0;
  double lm_cond_cache = 0.0;  // unused placeholder
};

struct Decoder {
  int blank;
  int beam_size;
  double alpha;
  double beta;
  int offset;
  std::unique_ptr<ArpaLM> lm;

  std::string TokenWord(int id) const { return CodepointUtf8(id + offset); }
};

using Prefix = std::vector<int32_t>;

struct PrefixHash {
  size_t operator()(const Prefix& p) const {
    size_t h = 1469598103934665603ull;
    for (int32_t v : p) {
      h ^= static_cast<size_t>(v) + 0x9e3779b97f4a7c15ull;
      h *= 1099511628211ull;
    }
    return h;
  }
};

double LmAdd(const Decoder& d, const Prefix& prefix, int c) {
  if (!d.lm) return 0.0;
  std::vector<std::string> history;
  history.reserve(prefix.size());
  for (int32_t p : prefix) history.push_back(d.TokenWord(p));
  double log10p = d.lm->Log10Cond(history, d.TokenWord(c));
  return d.alpha * log10p * kLn10 + d.beta;
}

// Returns beams sorted best-first: (prefix, total combined log-likelihood).
std::vector<std::pair<Prefix, double>> PrefixBeamSearch(
    const Decoder& d, const float* logp, int T, int V, int seq_len) {
  using Map = std::unordered_map<Prefix, BeamState, PrefixHash>;
  Map beams;
  beams[{}] = BeamState{0.0, kNegInf, 0.0, 0.0};

  for (int t = 0; t < seq_len && t < T; ++t) {
    const float* row = logp + static_cast<int64_t>(t) * V;
    Map next;
    next.reserve(beams.size() * 8);

    auto acc = [&](const Prefix& prefix, double pb, double pnb, double lm) {
      auto& st = next[prefix];
      if (st.p_blank == kNegInf && st.p_non_blank == kNegInf) st.lm_score = lm;
      st.p_blank = LogSumExp2(st.p_blank, pb);
      st.p_non_blank = LogSumExp2(st.p_non_blank, pnb);
    };

    for (const auto& kv : beams) {
      const Prefix& prefix = kv.first;
      const BeamState& st = kv.second;
      double total = LogSumExp2(st.p_blank, st.p_non_blank);
      int last = prefix.empty() ? -1 : prefix.back();
      for (int c = 0; c < V; ++c) {
        double p = row[c];
        if (c == d.blank) {
          acc(prefix, total + p, kNegInf, st.lm_score);
        } else if (c == last) {
          acc(prefix, kNegInf, st.p_non_blank + p, st.lm_score);
          if (st.p_blank != kNegInf) {
            Prefix np = prefix;
            np.push_back(c);
            acc(np, kNegInf, st.p_blank + p,
                st.lm_score + LmAdd(d, prefix, c));
          }
        } else {
          Prefix np = prefix;
          np.push_back(c);
          acc(np, kNegInf, total + p, st.lm_score + LmAdd(d, prefix, c));
        }
      }
    }

    // Prune to beam_size by combined score.
    std::vector<std::pair<double, Prefix>> scored;
    scored.reserve(next.size());
    for (auto& kv : next) {
      double s = LogSumExp2(kv.second.p_blank, kv.second.p_non_blank) +
                 kv.second.lm_score;
      scored.emplace_back(s, kv.first);
    }
    int keep = std::min<int>(d.beam_size, scored.size());
    std::partial_sort(scored.begin(), scored.begin() + keep, scored.end(),
                      [](const auto& a, const auto& b) { return a.first > b.first; });
    Map pruned;
    for (int i = 0; i < keep; ++i) pruned[scored[i].second] = next[scored[i].second];
    beams.swap(pruned);
  }

  std::vector<std::pair<Prefix, double>> out;
  out.reserve(beams.size());
  for (auto& kv : beams) {
    double s = LogSumExp2(kv.second.p_blank, kv.second.p_non_blank) +
               kv.second.lm_score;
    out.emplace_back(kv.first, s);
  }
  std::sort(out.begin(), out.end(),
            [](const auto& a, const auto& b) { return a.second > b.second; });
  return out;
}

}  // namespace

extern "C" {

void* bd_create(int blank, int beam_size, double alpha, double beta,
                const char* arpa_path, int offset) {
  auto* d = new Decoder{blank, beam_size, alpha, beta, offset, nullptr};
  if (arpa_path != nullptr && arpa_path[0] != '\0') {
    try {
      d->lm = std::make_unique<ArpaLM>(arpa_path);
    } catch (...) {
      delete d;
      return nullptr;
    }
  }
  return d;
}

void bd_destroy(void* handle) { delete static_cast<Decoder*>(handle); }

// Decode one utterance. Outputs: out_tokens (beam_size x max_out_len int32),
// out_lens (beam_size int32), out_scores (beam_size double, total combined
// log-likelihood, higher = better). Returns number of beams produced.
int bd_decode(void* handle, const float* logp, int T, int V, int seq_len,
              int32_t* out_tokens, int32_t* out_lens, double* out_scores,
              int max_out_len) {
  auto* d = static_cast<Decoder*>(handle);
  auto beams = PrefixBeamSearch(*d, logp, T, V, seq_len);
  int n = std::min<int>(d->beam_size, beams.size());
  for (int i = 0; i < n; ++i) {
    const auto& prefix = beams[i].first;
    int len = std::min<int>(prefix.size(), max_out_len);
    std::memcpy(out_tokens + static_cast<int64_t>(i) * max_out_len,
                prefix.data(), len * sizeof(int32_t));
    out_lens[i] = len;
    out_scores[i] = beams[i].second;
  }
  return n;
}

}  // extern "C"
