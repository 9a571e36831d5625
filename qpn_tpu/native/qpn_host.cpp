// Native host-side kernels for the enumeration bookkeeping.
//
// The TPU executes all numeric math (ops/, geometry/setops); what remains on
// host is combinatorial: expanding complementarity-label products into
// recipe tensors (avi_solutions.jl:200-215's all_Ks) and quantized row
// hashing for piece/vertex dedup (the reference's 5-digit rounding,
// sets.jl:104-112).  Those inner loops are pure integer/byte work — exactly
// the part CPython is slowest at — so they live here, loaded via ctypes
// (no pybind11 in this image), with pure-Python fallbacks in
// qpn_tpu/utils/native.py.
//
// Build: g++ -O3 -shared -fPIC qpn_host.cpp -o libqpn_host.so

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

// Cartesian product of per-row label choices.
//   labels:  flattened choice lists (int32), row r occupies
//            [offsets[r], offsets[r+1])
//   n_rows:  number of complementarity rows
//   cap:     maximum number of recipes to emit
//   out:     (cap * n_rows) int32 buffer, recipes row-major
// returns the number of recipes written (product truncated at cap).
int64_t qpn_recipe_product(const int32_t* labels, const int64_t* offsets,
                           int64_t n_rows, int64_t cap, int32_t* out) {
    // odometer over the choice lists
    int64_t* idx = new int64_t[n_rows];
    std::memset(idx, 0, sizeof(int64_t) * n_rows);
    int64_t count = 0;
    bool done = (n_rows == 0);
    while (!done && count < cap) {
        int32_t* row = out + count * n_rows;
        for (int64_t r = 0; r < n_rows; ++r) {
            row[r] = labels[offsets[r] + idx[r]];
        }
        ++count;
        // increment odometer (last row fastest, matching itertools.product)
        int64_t r = n_rows - 1;
        while (r >= 0) {
            idx[r] += 1;
            if (idx[r] < offsets[r + 1] - offsets[r]) break;
            idx[r] = 0;
            --r;
        }
        if (r < 0) done = true;
    }
    delete[] idx;
    return count;
}

// FNV-1a hash of rows rounded to `digits` decimal digits; -0.0 folds to 0.0.
// data: (rows * cols) doubles; out: rows uint64 hashes.
void qpn_quantize_hash(const double* data, int64_t rows, int64_t cols,
                       int32_t digits, uint64_t* out) {
    const double scale = std::pow(10.0, digits);
    for (int64_t r = 0; r < rows; ++r) {
        uint64_t h = 1469598103934665603ULL;
        const double* row = data + r * cols;
        for (int64_t c = 0; c < cols; ++c) {
            double v = std::round(row[c] * scale);
            if (v == 0.0) v = 0.0;  // fold -0.0
            int64_t q;
            if (std::isnan(v)) q = INT64_MIN;
            else if (v > 9.2e18) q = INT64_MAX;
            else if (v < -9.2e18) q = INT64_MIN + 1;
            else q = (int64_t)v;
            const unsigned char* bytes = (const unsigned char*)&q;
            for (int b = 0; b < 8; ++b) {
                h ^= bytes[b];
                h *= 1099511628211ULL;
            }
        }
        out[r] = h;
    }
}

// Deduplicate rows by quantized equality: out_keep[r] = 1 iff row r is the
// first occurrence of its quantized content.  Exact comparison on the
// quantized integers (no hash collisions), O(rows^2 * cols) worst case with
// a hash prefilter.
void qpn_dedupe_rows(const double* data, int64_t rows, int64_t cols,
                     int32_t digits, uint8_t* out_keep) {
    const double scale = std::pow(10.0, digits);
    int64_t* q = new int64_t[rows * cols];
    for (int64_t r = 0; r < rows; ++r) {
        for (int64_t c = 0; c < cols; ++c) {
            double v = std::round(data[r * cols + c] * scale);
            if (v == 0.0) v = 0.0;
            int64_t qi;
            if (std::isnan(v)) qi = INT64_MIN;
            else if (v > 9.2e18) qi = INT64_MAX;
            else if (v < -9.2e18) qi = INT64_MIN + 1;
            else qi = (int64_t)v;
            q[r * cols + c] = qi;
        }
    }
    uint64_t* hashes = new uint64_t[rows];
    qpn_quantize_hash(data, rows, cols, digits, hashes);
    for (int64_t r = 0; r < rows; ++r) {
        out_keep[r] = 1;
        for (int64_t p = 0; p < r; ++p) {
            if (hashes[p] != hashes[r] || !out_keep[p]) continue;
            if (std::memcmp(q + p * cols, q + r * cols,
                            sizeof(int64_t) * cols) == 0) {
                out_keep[r] = 0;
                break;
            }
        }
    }
    delete[] q;
    delete[] hashes;
}

}  // extern "C"
