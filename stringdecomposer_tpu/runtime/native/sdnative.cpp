// Native host runtime for stringdecomposer_tpu.
//
// The TPU kernels produce compact per-window block records; everything that
// remains on the host path at production scale (merging windows to global
// coordinates, the halo-duplicate suppression, raw-TSV formatting, FASTA
// encoding/validation, homopolymer compression) is implemented here and
// loaded via ctypes (runtime/native.py), with pure-NumPy fallbacks.
//
// Semantics mirror the reference C++ host logic exactly:
//   - PostProcessing overlap rule        (reference: src/main.cpp:287-302)
//   - SaveBatch 7-column raw TSV          (reference: src/main.cpp:272-285)
//   - ACGTN validation                    (reference: src/main.cpp:330-344)
//   - homopolymer compression             (reference: main.py:87-92)
//
// Build: make -C stringdecomposer_tpu/runtime/native   (produces libsdnative.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// Encode ACGTN -> 0..4 into out; returns -1 on success or the index of the
// first invalid character. 'N' maps to 4 (a real symbol in scoring).
int64_t sd_encode_validate(const char* seq, int64_t n, int8_t* out) {
    static int8_t table[256];
    static bool init = false;
    if (!init) {
        memset(table, -1, sizeof(table));
        table[(unsigned char)'A'] = 0;
        table[(unsigned char)'C'] = 1;
        table[(unsigned char)'G'] = 2;
        table[(unsigned char)'T'] = 3;
        table[(unsigned char)'N'] = 4;
        init = true;
    }
    for (int64_t i = 0; i < n; ++i) {
        int8_t c = table[(unsigned char)seq[i]];
        if (c < 0) return i;
        out[i] = c;
    }
    return -1;
}

// Homopolymer-compress codes in place semantics: writes compressed sequence
// to out, returns its length (reference main.py:87-92).
int64_t sd_homo_compress(const int8_t* seq, int64_t n, int8_t* out) {
    int64_t m = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (m == 0 || out[m - 1] != seq[i]) out[m++] = seq[i];
    }
    return m;
}

// Halo-duplicate suppression (reference src/main.cpp:287-302), exact
// transcription including the quirk that the landing block is emitted
// without its own overlap check. blocks: [n,4] int32 rows (monomer, start,
// end, identity). keep: out bool array. Returns kept count.
int64_t sd_postprocess(const int32_t* blocks, int64_t n, uint8_t* keep) {
    memset(keep, 0, n);
    int64_t kept = 0;
    int64_t i = 0;
    while (i < n) {
        int64_t lim = i + 7 < n ? i + 7 : n;
        for (int64_t j = i + 1; j < lim; ++j) {
            int32_t end_i = blocks[i * 4 + 2];
            int32_t start_j = blocks[j * 4 + 1];
            int32_t end_j = blocks[j * 4 + 2];
            if ((end_i - start_j) * 2 > (end_j - start_j)) {
                keep[i] = 1;
                ++kept;
                i = j + 1;
                break;
            }
        }
        if (i < n) {
            keep[i] = 1;
            ++kept;
        }
        ++i;
    }
    return kept;
}

// Format the 7-column raw TSV for one read's postprocessed blocks
// (reference src/main.cpp:272-285; identity printed like
// std::to_string(float): "%f", six decimals).
// names_buf/names_off: concatenated monomer names + [M+1] offsets.
// out must have room; returns bytes written.
int64_t sd_format_raw(
    const int32_t* blocks, int64_t n,  // [n,4] (monomer, start, end, identity)
    const char* read_name, int64_t read_name_len,
    const char* names_buf, const int64_t* names_off,
    char* out, int64_t out_cap) {
    int64_t w = 0;
    int32_t prev_end = 0;
    for (int64_t b = 0; b < n; ++b) {
        int32_t m = blocks[b * 4 + 0];
        int32_t s = blocks[b * 4 + 1];
        int32_t e = blocks[b * 4 + 2];
        int32_t id = blocks[b * 4 + 3];
        int64_t name_len = names_off[m + 1] - names_off[m];
        // worst-case row size check
        if (w + read_name_len + name_len + 96 > out_cap) return -1;
        memcpy(out + w, read_name, read_name_len);
        w += read_name_len;
        out[w++] = '\t';
        memcpy(out + w, names_buf + names_off[m], name_len);
        w += name_len;
        w += snprintf(out + w, out_cap - w, "\t%d\t%d\t%.6f\t%d\t%d\n",
                      s, e, (double)(float)id, s - prev_end, e - s);
        prev_end = e;
    }
    return w;
}

}  // extern "C"
