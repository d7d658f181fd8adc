// Native raw-dataset preprocessor: the parse/encode half of the
// reference's load_data.py (examples/ctr/models/load_data.py:151-206)
// at production scale. The Python path (herald_tpu/data/preprocess.py)
// materializes every cell as a Python string — fine for format tests,
// ~hours for the 45M-row Criteo file on one core. This parser streams
// the raw delimited file once, assigns per-column categorical codes in
// LEXICOGRAPHIC unique order (exactly np.unique's order over the token
// strings, which is what sklearn LabelEncoder / the reference produce),
// and writes flat binary columns the Python wrapper memmaps for the
// numpy-vectorized transform/split/save steps.
//
// Output files (raw little-endian, no header):
//   out_dense:  float64 [n, n_dense]   raw numeric values, missing -> 0
//               (double so the wrapper's log-transform matches the
//                Python path bit-for-bit: both are strtod parses)
//   out_sparse: int64   [n, n_sparse]  per-column codes from 0 (no
//                                      cross-column offsets; the wrapper
//                                      adds cumulative offsets)
//   out_labels: float32 [n]
//
// C ABI: hprep_table returns the row count, or -1 on error (message on
// stderr). uniq_counts_out[n_sparse] receives per-column cardinalities.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct ColumnEncoder {
    // token -> first-seen tmp id; remapped to sorted order at the end
    std::unordered_map<std::string, int32_t> map;
    std::vector<const std::string *> tokens;   // tmp id -> token

    int32_t encode(const char *tok, size_t len) {
        auto it = map.find(std::string(tok, len));   // small-string opt
        if (it != map.end()) return it->second;
        int32_t id = int32_t(tokens.size());
        auto ins = map.emplace(std::string(tok, len), id);
        tokens.push_back(&ins.first->first);
        return id;
    }

    // sorted-unique-order remap (np.unique over '<U' tokens sorts
    // lexicographically by char code; ASCII bytes sort the same way)
    std::vector<int32_t> sorted_remap() const {
        std::vector<int32_t> order(tokens.size());
        for (size_t i = 0; i < order.size(); i++) order[i] = int32_t(i);
        std::sort(order.begin(), order.end(),
                  [&](int32_t a, int32_t b) {
                      return *tokens[a] < *tokens[b];
                  });
        std::vector<int32_t> remap(tokens.size());
        for (size_t r = 0; r < order.size(); r++)
            remap[order[r]] = int32_t(r);
        return remap;
    }
};

}  // namespace

extern "C" int64_t hprep_table(
    const char *path, char delim, int skip_header, int label_col,
    const int *dense_cols, int n_dense, const int *sparse_cols,
    int n_sparse, const char *out_dense, const char *out_sparse,
    const char *out_labels, int64_t *uniq_counts_out) {
    FILE *f = fopen(path, "rb");
    if (!f) {
        fprintf(stderr, "hprep_table: cannot open %s\n", path);
        return -1;
    }
    int ncols = label_col + 1;
    for (int i = 0; i < n_dense; i++)
        ncols = std::max(ncols, dense_cols[i] + 1);
    for (int i = 0; i < n_sparse; i++)
        ncols = std::max(ncols, sparse_cols[i] + 1);

    std::vector<ColumnEncoder> enc(n_sparse);
    std::vector<double> dense_buf;
    std::vector<float> label_buf;
    std::vector<int32_t> tmp_codes;   // [n, n_sparse] first-seen codes
    dense_buf.reserve(1 << 20);
    tmp_codes.reserve(1 << 20);

    std::string line;
    line.reserve(4096);
    char buf[1 << 16];
    int64_t n = 0;
    bool first = true;
    std::vector<std::pair<const char *, size_t>> fields(ncols);
    while (fgets(buf, sizeof buf, f)) {
        line.assign(buf);
        while (!line.empty() && line.back() != '\n'
               && fgets(buf, sizeof buf, f))
            line.append(buf);                   // long-line continuation
        if (first && skip_header) {
            first = false;
            continue;
        }
        first = false;
        // strip trailing newline/CR
        size_t end = line.size();
        while (end && (line[end - 1] == '\n' || line[end - 1] == '\r'))
            end--;
        if (end == 0) continue;                 // blank line
        // split
        int nf = 0;
        size_t start = 0;
        for (size_t i = 0; i <= end && nf < ncols; i++) {
            if (i == end || line[i] == delim) {
                fields[nf++] = {line.data() + start, i - start};
                start = i + 1;
            }
        }
        for (int i = nf; i < ncols; i++) fields[i] = {line.data(), 0};

        auto numeric = [&](int c) -> double {
            const char *s = fields[c].first;
            size_t len = fields[c].second;
            if (len == 0) return 0.0;           // fillna(0.0)
            char tmp[64];
            size_t m = std::min(len, sizeof tmp - 1);
            memcpy(tmp, s, m);
            tmp[m] = 0;
            return atof(tmp);
        };
        label_buf.push_back(float(numeric(label_col)));
        for (int i = 0; i < n_dense; i++)
            dense_buf.push_back(numeric(dense_cols[i]));
        for (int i = 0; i < n_sparse; i++) {
            const char *s = fields[sparse_cols[i]].first;
            size_t len = fields[sparse_cols[i]].second;
            if (len == 0) {                      // fillna("-1")
                s = "-1";
                len = 2;
            }
            tmp_codes.push_back(enc[i].encode(s, len));
        }
        n++;
    }
    fclose(f);

    // remap first-seen codes to sorted-unique order and write outputs
    std::vector<std::vector<int32_t>> remaps(n_sparse);
    for (int i = 0; i < n_sparse; i++) {
        remaps[i] = enc[i].sorted_remap();
        uniq_counts_out[i] = int64_t(enc[i].tokens.size());
    }
    FILE *fd = fopen(out_dense, "wb");
    FILE *fs = fopen(out_sparse, "wb");
    FILE *fl = fopen(out_labels, "wb");
    if (!fd || !fs || !fl) {
        fprintf(stderr, "hprep_table: cannot open an output file\n");
        if (fd) fclose(fd);
        if (fs) fclose(fs);
        if (fl) fclose(fl);
        return -1;
    }
    fwrite(dense_buf.data(), sizeof(double), dense_buf.size(), fd);
    fwrite(label_buf.data(), sizeof(float), label_buf.size(), fl);
    std::vector<int64_t> row(n_sparse);
    for (int64_t r = 0; r < n; r++) {
        for (int i = 0; i < n_sparse; i++)
            row[i] = int64_t(remaps[i][tmp_codes[r * n_sparse + i]]);
        fwrite(row.data(), sizeof(int64_t), size_t(n_sparse), fs);
    }
    fclose(fd);
    fclose(fs);
    fclose(fl);
    return n;
}

// ABI guard — see herald_sched.cc tail note.
#ifndef HERALD_ABI_HASH
#define HERALD_ABI_HASH 0L
#endif
extern "C" long herald_abi_hash() { return HERALD_ABI_HASH; }
