// Native CLIP byte-level BPE encoder (C ABI, loaded via ctypes).
//
// The tokenizer is the only per-batch host-side compute in the pipeline
// (everything else is compiled device code); this engine removes the
// Python merge loop from the serving path. Vocabulary construction
// mirrors data/tokenizer.py exactly: 256 byte-mapped symbols, their
// </w> variants, one token per merge, then <|startoftext|>/<|endoftext|>
// — so token ids are bit-identical to the Python implementation.
//
// Build: g++ -O3 -shared -fPIC -o libpso_bpe.so bpe.cpp  (see build.py)

#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// GPT-2/CLIP byte -> printable-unicode map (as UTF-8 strings). The
// *insertion order* of the python dict (printable ranges first, then the
// remapped bytes) defines vocab id order — preserved via `order`.
struct ByteTable {
    std::vector<std::string> by_byte;   // index = raw byte value
    std::vector<std::string> in_order;  // python dict insertion order
};

ByteTable byte_to_unicode() {
    std::vector<int> bs;
    for (int b = '!'; b <= '~'; ++b) bs.push_back(b);
    for (int b = 0xA1; b <= 0xAC; ++b) bs.push_back(b);
    for (int b = 0xAE; b <= 0xFF; ++b) bs.push_back(b);
    std::vector<int> cs(bs);
    int n = 0;
    std::vector<bool> present(256, false);
    for (int b : bs) present[b] = true;
    for (int b = 0; b < 256; ++b) {
        if (!present[b]) {
            bs.push_back(b);
            cs.push_back(256 + n);
            ++n;
        }
    }
    std::vector<std::string> table(256);
    auto utf8 = [](int cp) {
        std::string s;
        if (cp < 0x80) {
            s += static_cast<char>(cp);
        } else if (cp < 0x800) {
            s += static_cast<char>(0xC0 | (cp >> 6));
            s += static_cast<char>(0x80 | (cp & 0x3F));
        } else {
            s += static_cast<char>(0xE0 | (cp >> 12));
            s += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
            s += static_cast<char>(0x80 | (cp & 0x3F));
        }
        return s;
    };
    ByteTable out;
    out.by_byte = table;
    for (size_t i = 0; i < bs.size(); ++i) {
        out.by_byte[bs[i]] = utf8(cs[i]);
        out.in_order.push_back(utf8(cs[i]));
    }
    return out;
}

struct Tokenizer {
    std::unordered_map<std::string, int32_t> encoder;
    std::unordered_map<std::string, int32_t> bpe_ranks;  // "A B" -> rank
    ByteTable byte_map = byte_to_unicode();
    std::unordered_map<std::string, std::vector<int32_t>> cache;
    // ctypes releases the GIL during calls: the cache is the only
    // mutable state, so guard it (uncontended lock cost is noise next
    // to the merge loop)
    std::mutex cache_mu;
};

std::vector<std::string> split_lines(const char* blob, size_t len) {
    std::vector<std::string> out;
    std::string cur;
    for (size_t i = 0; i < len; ++i) {
        if (blob[i] == '\n') {
            if (!cur.empty()) out.push_back(cur);
            cur.clear();
        } else {
            cur += blob[i];
        }
    }
    if (!cur.empty()) out.push_back(cur);
    return out;
}

}  // namespace

extern "C" {

// merges_blob: newline-separated "A B" merge lines (no version header).
void* pso_tok_create(const char* merges_blob, size_t len) {
    auto* tok = new Tokenizer();
    auto merges = split_lines(merges_blob, len);

    int32_t idx = 0;
    std::vector<std::string> vocab;
    for (const auto& s : tok->byte_map.in_order) vocab.push_back(s);
    for (const auto& s : tok->byte_map.in_order) vocab.push_back(s + "</w>");
    for (const auto& m : merges) {
        auto sp = m.find(' ');
        if (sp == std::string::npos) continue;
        vocab.push_back(m.substr(0, sp) + m.substr(sp + 1));
    }
    vocab.push_back("<|startoftext|>");
    vocab.push_back("<|endoftext|>");
    for (const auto& v : vocab) tok->encoder.emplace(v, idx++);

    int32_t rank = 0;
    for (const auto& m : merges) {
        if (m.find(' ') == std::string::npos) continue;
        tok->bpe_ranks.emplace(m, rank++);
    }
    return tok;
}

void pso_tok_destroy(void* handle) { delete static_cast<Tokenizer*>(handle); }

// Encode ONE regex-split token (raw bytes). Returns id count (<= max_out).
int32_t pso_tok_encode_word(void* handle, const char* word, size_t len,
                            int32_t* out, int32_t max_out) {
    auto* tok = static_cast<Tokenizer*>(handle);
    std::string key(word, len);
    {
        std::lock_guard<std::mutex> lock(tok->cache_mu);
        auto hit = tok->cache.find(key);
        if (hit != tok->cache.end()) {
            int32_t n = static_cast<int32_t>(hit->second.size());
            if (n > max_out) return -1;
            std::memcpy(out, hit->second.data(), n * sizeof(int32_t));
            return n;
        }
    }

    // initial symbols: byte-mapped chars, last one with </w>
    std::vector<std::string> parts;
    for (size_t i = 0; i < len; ++i)
        parts.push_back(tok->byte_map.by_byte[static_cast<unsigned char>(word[i])]);
    if (parts.empty()) return 0;
    parts.back() += "</w>";

    // merge loop: repeatedly join the lowest-rank adjacent pair
    while (parts.size() > 1) {
        int32_t best_rank = INT32_MAX;
        size_t best_i = 0;
        for (size_t i = 0; i + 1 < parts.size(); ++i) {
            auto it = tok->bpe_ranks.find(parts[i] + " " + parts[i + 1]);
            if (it != tok->bpe_ranks.end() && it->second < best_rank) {
                best_rank = it->second;
                best_i = i;
            }
        }
        if (best_rank == INT32_MAX) break;
        // merge ALL occurrences of this pair left-to-right (python parity)
        const std::string first = parts[best_i];
        const std::string second = parts[best_i + 1];
        std::vector<std::string> next;
        size_t i = 0;
        while (i < parts.size()) {
            if (i + 1 < parts.size() && parts[i] == first && parts[i + 1] == second) {
                next.push_back(first + second);
                i += 2;
            } else {
                next.push_back(parts[i]);
                i += 1;
            }
        }
        parts.swap(next);
    }

    std::vector<int32_t> ids;
    for (const auto& p : parts) {
        auto it = tok->encoder.find(p);
        if (it == tok->encoder.end()) return -2;  // should be impossible
        ids.push_back(it->second);
    }
    {
        std::lock_guard<std::mutex> lock(tok->cache_mu);
        tok->cache.emplace(std::move(key), ids);
    }
    int32_t n = static_cast<int32_t>(ids.size());
    if (n > max_out) return -1;
    std::memcpy(out, ids.data(), n * sizeof(int32_t));
    return n;
}

int32_t pso_tok_vocab_size(void* handle) {
    return static_cast<int32_t>(static_cast<Tokenizer*>(handle)->encoder.size());
}

}  // extern "C"
