// BPE merge core: the tokenizer's hot inner loop in C++.
//
// TPU-native equivalent of the reference's dependency on the SentencePiece
// C++ library (pasero/tokenizers/__init__.py:37-38): encoding throughput for
// the data pipeline is dominated by the per-word merge loop, which this
// implements natively (greedy lowest-rank pair merging over UTF-8 symbols,
// identical semantics to PaseroTokenizer._encode). Exposed through a plain C
// ABI consumed via ctypes (pasero_tpu/tokenizers/native.py) — no pybind11.
//
// Build: make -C native   (produces libbpe_core.so)

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
    size_t operator()(const std::pair<std::string, std::string>& p) const {
        std::hash<std::string> h;
        return h(p.first) * 1000003u ^ h(p.second);
    }
};

struct BpeModel {
    std::unordered_map<std::pair<std::string, std::string>, int32_t, PairHash>
        merges;
};

// split a UTF-8 string into single codepoint strings
std::vector<std::string> utf8_split(const char* s, size_t len) {
    std::vector<std::string> out;
    size_t i = 0;
    while (i < len) {
        unsigned char c = s[i];
        size_t n = 1;
        if ((c & 0x80) == 0x00) n = 1;
        else if ((c & 0xE0) == 0xC0) n = 2;
        else if ((c & 0xF0) == 0xE0) n = 3;
        else if ((c & 0xF8) == 0xF0) n = 4;
        if (i + n > len) n = 1;  // tolerate malformed input
        out.emplace_back(s + i, n);
        i += n;
    }
    return out;
}

}  // namespace

extern "C" {

// Create a model from flat merge data: `data` holds `count` pairs as
// NUL-separated strings "left\0right\0left\0right\0..." with rank = order.
void* bpe_new(const char* data, int64_t total_bytes, int64_t count) {
    auto* model = new BpeModel();
    const char* p = data;
    const char* end = data + total_bytes;
    for (int64_t i = 0; i < count && p < end; ++i) {
        std::string left(p);
        p += left.size() + 1;
        if (p >= end) break;
        std::string right(p);
        p += right.size() + 1;
        model->merges.emplace(std::make_pair(std::move(left), std::move(right)),
                              static_cast<int32_t>(i));
    }
    return model;
}

void bpe_free(void* handle) { delete static_cast<BpeModel*>(handle); }

// Encode one word: returns the number of bytes written to `out`, where the
// output pieces are separated by '\n'. Returns -1 if `out_cap` is too small.
int64_t bpe_encode_word(void* handle, const char* word, int64_t word_len,
                        char* out, int64_t out_cap) {
    auto* model = static_cast<BpeModel*>(handle);
    std::vector<std::string> symbols = utf8_split(word, (size_t)word_len);

    while (symbols.size() > 1) {
        int32_t best_rank = INT32_MAX;
        size_t best_idx = 0;
        for (size_t i = 0; i + 1 < symbols.size(); ++i) {
            auto it = model->merges.find({symbols[i], symbols[i + 1]});
            if (it != model->merges.end() && it->second < best_rank) {
                best_rank = it->second;
                best_idx = i;
            }
        }
        if (best_rank == INT32_MAX) break;
        // merge every non-overlapping occurrence of the best pair, scanning
        // left to right (same as the python reference implementation)
        const std::string left = symbols[best_idx];
        const std::string right = symbols[best_idx + 1];
        std::vector<std::string> merged;
        merged.reserve(symbols.size());
        for (size_t i = 0; i < symbols.size();) {
            if (i + 1 < symbols.size() && symbols[i] == left &&
                symbols[i + 1] == right) {
                merged.emplace_back(left + right);
                i += 2;
            } else {
                merged.emplace_back(std::move(symbols[i]));
                i += 1;
            }
        }
        symbols.swap(merged);
    }

    int64_t written = 0;
    for (size_t i = 0; i < symbols.size(); ++i) {
        int64_t need = (int64_t)symbols[i].size() + (i + 1 < symbols.size());
        if (written + need > out_cap) return -1;
        std::memcpy(out + written, symbols[i].data(), symbols[i].size());
        written += symbols[i].size();
        if (i + 1 < symbols.size()) out[written++] = '\n';
    }
    return written;
}

}  // extern "C"
