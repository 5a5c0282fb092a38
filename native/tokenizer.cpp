// Native SPM tokenizer core (C ABI, loaded via ctypes).
//
// Parity target: llm_tokenizer_spm (reference src/llama-vocab.cpp:190) —
// greedy bigram merging by piece score with byte fallback, the host-side
// hot loop of prompt processing.  The algorithm and tie-breaking replicate
// tokenizer/spm.py exactly (heap ordered by (-score, left, right, llen,
// rlen)), so native and Python paths produce identical ids.
//
// Build: c++ -O3 -shared -fPIC tokenizer.cpp -o liblktpu_tok.so

#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct SpmVocab {
    std::unordered_map<std::string, int32_t> token_to_id;
    std::vector<float> scores;
    int32_t unk_id = 0;
    int32_t byte_ids[256];
};

struct Bigram {
    float neg_score;
    int32_t left, right;
    int32_t llen, rlen;
    bool operator>(const Bigram& o) const {  // min-heap on the python tuple
        if (neg_score != o.neg_score) return neg_score > o.neg_score;
        if (left != o.left) return left > o.left;
        if (right != o.right) return right > o.right;
        if (llen != o.llen) return llen > o.llen;
        return rlen > o.rlen;
    }
};

int utf8_len(unsigned char b) {
    if (b < 0x80) return 1;
    if ((b >> 5) == 0x6) return 2;
    if ((b >> 4) == 0xE) return 3;
    if ((b >> 3) == 0x1E) return 4;
    return 1;
}

void resegment(const SpmVocab* v, const std::string& sym,
               const std::unordered_map<std::string, std::pair<std::string, std::string>>& rev,
               std::vector<int32_t>& out) {
    auto it = v->token_to_id.find(sym);
    if (it != v->token_to_id.end()) {
        out.push_back(it->second);
        return;
    }
    auto r = rev.find(sym);
    if (r == rev.end()) {
        for (unsigned char b : sym) {
            if (v->byte_ids[b] >= 0) {
                out.push_back(v->byte_ids[b]);
            } else {
                // python parity (Vocab.byte_token): fall back to the
                // UTF-8 encoding of chr(b), not the raw byte
                std::string key;
                if (b < 0x80) {
                    key.push_back((char)b);
                } else {
                    key.push_back((char)(0xC0 | (b >> 6)));
                    key.push_back((char)(0x80 | (b & 0x3F)));
                }
                auto c = v->token_to_id.find(key);
                out.push_back(c != v->token_to_id.end() ? c->second : v->unk_id);
            }
        }
        return;
    }
    resegment(v, r->second.first, rev, out);
    resegment(v, r->second.second, rev, out);
}

}  // namespace

extern "C" {

void* spm_create(const char* blob, const int32_t* offsets, int32_t n,
                 const float* scores, const int32_t* types, int32_t unk_id) {
    auto* v = new SpmVocab();
    v->unk_id = unk_id;
    v->scores.assign(scores, scores + n);
    for (int i = 0; i < 256; i++) v->byte_ids[i] = -1;
    auto hexval = [](unsigned char c) -> int {  // -1 if not a hex digit
        if (c >= '0' && c <= '9') return c - '0';
        if (c >= 'A' && c <= 'F') return c - 'A' + 10;
        if (c >= 'a' && c <= 'f') return c - 'a' + 10;
        return -1;
    };
    for (int32_t i = 0; i < n; i++) {
        std::string s(blob + offsets[i], blob + offsets[i + 1]);
        v->token_to_id[s] = i;  // last occurrence wins, like the python dict
        // byte tokens match by STRING shape (type-independent, like the
        // python Vocab.byte_token '<0xXX>' lookup); hex digits validated
        // so malformed vocab entries can't index out of bounds
        if (s.size() == 6 && s[0] == '<' && s[1] == '0'
            && (s[2] == 'x' || s[2] == 'X') && s[5] == '>') {
            int hi = hexval((unsigned char)s[3]);
            int lo = hexval((unsigned char)s[4]);
            if (hi >= 0 && lo >= 0) v->byte_ids[hi * 16 + lo] = i;
        }
    }
    return v;
}

void spm_destroy(void* h) { delete static_cast<SpmVocab*>(h); }

// Tokenize one pre-escaped fragment (spaces already replaced by U+2581).
// Returns the number of ids written (or -needed if out buffer too small).
int32_t spm_encode(void* h, const char* text, int32_t text_len,
                   int32_t* out_ids, int32_t max_out) {
    const auto* v = static_cast<SpmVocab*>(h);
    if (text_len == 0) return 0;

    // symbols start as single codepoints, linked by prev/next
    struct Sym { std::string s; int prev, next; bool alive; };
    std::vector<Sym> syms;
    for (int i = 0; i < text_len;) {
        int l = std::min(utf8_len((unsigned char)text[i]), text_len - i);
        syms.push_back({std::string(text + i, text + i + l),
                        (int)syms.size() - 1, (int)syms.size() + 1, true});
        i += l;
    }

    std::priority_queue<Bigram, std::vector<Bigram>, std::greater<Bigram>> heap;
    std::unordered_map<std::string, std::pair<std::string, std::string>> rev;

    auto try_add = [&](int li, int ri) {
        if (li < 0 || ri >= (int)syms.size()) return;
        std::string cat = syms[li].s + syms[ri].s;
        auto it = v->token_to_id.find(cat);
        if (it == v->token_to_id.end() || it->second >= (int32_t)v->scores.size())
            return;
        heap.push({-v->scores[it->second], li, ri,
                   (int32_t)syms[li].s.size(), (int32_t)syms[ri].s.size()});
    };
    for (int i = 0; i + 1 < (int)syms.size(); i++) try_add(i, i + 1);

    while (!heap.empty()) {
        Bigram b = heap.top();
        heap.pop();
        if (!syms[b.left].alive || !syms[b.right].alive) continue;
        if ((int32_t)syms[b.left].s.size() != b.llen ||
            (int32_t)syms[b.right].s.size() != b.rlen) continue;  // stale
        std::string merged = syms[b.left].s + syms[b.right].s;
        rev[merged] = {syms[b.left].s, syms[b.right].s};
        syms[b.left].s = merged;
        syms[b.right].alive = false;
        syms[b.left].next = syms[b.right].next;
        if (syms[b.right].next < (int)syms.size())
            syms[syms[b.right].next].prev = b.left;
        try_add(syms[b.left].prev, b.left);
        if (syms[b.left].next < (int)syms.size()) try_add(b.left, syms[b.left].next);
    }

    std::vector<int32_t> out;
    for (const auto& s : syms)
        if (s.alive) resegment(v, s.s, rev, out);
    if ((int32_t)out.size() > max_out) return -(int32_t)out.size();
    std::memcpy(out_ids, out.data(), out.size() * sizeof(int32_t));
    return (int32_t)out.size();
}

}  // extern "C"

// ---------------------------------------------------------------- BPE core
//
// Parity target: llm_tokenizer_bpe's rank-greedy merge (reference
// src/llama-vocab.cpp:355).  Operates on byte-to-unicode-mapped words
// (the python side does the regex pre-tokenization and byte mapping).

namespace {

struct BpeVocab {
    std::unordered_map<std::string, int32_t> token_to_id;
    std::unordered_map<std::string, int32_t> ranks;  // "a\x1fb" -> rank
};

int cp_len(const std::string& s, size_t i) {
    return utf8_len((unsigned char)s[i]);
}

}  // namespace

extern "C" {

void* bpe_create(const char* vblob, const int32_t* voff, int32_t nv,
                 const char* mblob, const int32_t* moff, int32_t nm) {
    auto* v = new BpeVocab();
    for (int32_t i = 0; i < nv; i++)
        v->token_to_id[std::string(vblob + voff[i], vblob + voff[i + 1])] = i;
    for (int32_t i = 0; i < nm; i++) {
        std::string m(mblob + moff[i], mblob + moff[i + 1]);
        size_t sp = m.find(' ');
        if (sp == std::string::npos) continue;
        v->ranks[m.substr(0, sp) + '\x1f' + m.substr(sp + 1)] = i;
    }
    return v;
}

void bpe_destroy(void* h) { delete static_cast<BpeVocab*>(h); }

int32_t bpe_word(void* h, const char* word, int32_t len,
                 int32_t* out_ids, int32_t max_out) {
    const auto* v = static_cast<BpeVocab*>(h);
    std::string u(word, word + len);
    // split into codepoint symbols
    std::vector<std::string> syms;
    for (size_t i = 0; i < u.size();) {
        size_t l = std::min<size_t>(cp_len(u, i), u.size() - i);
        syms.emplace_back(u, i, l);
        i += l;
    }
    while (syms.size() > 1) {
        int32_t best_rank = INT32_MAX;
        int best_i = -1;
        for (size_t i = 0; i + 1 < syms.size(); i++) {
            auto it = v->ranks.find(syms[i] + '\x1f' + syms[i + 1]);
            if (it != v->ranks.end() && it->second < best_rank) {
                best_rank = it->second;
                best_i = (int)i;
            }
        }
        if (best_i < 0) break;
        syms[best_i] += syms[best_i + 1];
        syms.erase(syms.begin() + best_i + 1);
    }
    std::vector<int32_t> out;
    for (const auto& s : syms) {
        auto it = v->token_to_id.find(s);
        if (it != v->token_to_id.end()) {
            out.push_back(it->second);
            continue;
        }
        for (size_t i = 0; i < s.size();) {  // per-codepoint fallback
            size_t l = std::min<size_t>(cp_len(s, i), s.size() - i);
            auto c = v->token_to_id.find(s.substr(i, l));
            if (c != v->token_to_id.end()) out.push_back(c->second);
            i += l;
        }
    }
    if ((int32_t)out.size() > max_out) return -(int32_t)out.size();
    std::memcpy(out_ids, out.data(), out.size() * sizeof(int32_t));
    return (int32_t)out.size();
}

}  // extern "C"
