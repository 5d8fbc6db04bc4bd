// Native host entropy codec — the performance-grade CPU path.
//
// Plays the role of the reference's C host coders
// (reference: src/gpujpeg_huffman_cpu_encoder.c, gpujpeg_huffman_cpu_decoder.c):
// sequential T.81 F.1.2 bit emission with 0xFF stuffing on encode, and a
// 16-bit-lookahead table decoder with stuffed-byte skipping and
// corrupt-stream guards on decode. Bit-exact with the NumPy golden coder
// in ops/golden.py (property-tested), ~100x faster, used for the CPU
// fallback paths (restart_interval == 0, tiny segment counts, foreign
// JPEG decode) where the reference also runs on the host
// (reference: gpujpeg_decoder.c:238-252).
//
// Plain C ABI; loaded from Python via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// Encode
// ---------------------------------------------------------------------------

struct BitWriter {
    uint8_t* out;
    int64_t pos, cap;
    uint64_t acc;
    int nbits;
    bool overflow;
};

static inline void bw_put(BitWriter& bw, uint32_t code, int length) {
    if (length == 0) return;
    bw.acc = (bw.acc << length) | (code & ((1u << length) - 1));
    bw.nbits += length;
    while (bw.nbits >= 8) {
        uint8_t b = (uint8_t)((bw.acc >> (bw.nbits - 8)) & 0xFF);
        if (bw.pos + 2 > bw.cap) { bw.overflow = true; return; }
        bw.out[bw.pos++] = b;
        if (b == 0xFF) bw.out[bw.pos++] = 0x00;
        bw.nbits -= 8;
        bw.acc &= (1ull << bw.nbits) - 1;
    }
}

static inline int category(int32_t v) {
    uint32_t a = v < 0 ? (uint32_t)(-(int64_t)v) : (uint32_t)v;
    return a == 0 ? 0 : 32 - __builtin_clz(a);
}

// Encode all segments. coeff: (n_blocks, 64) int32 zig-zag, scan order.
// Tables: (n_comp, 256) int32 each. Returns total bytes written, or -1 on
// output overflow. seg_offsets gets n_segments+1 entries.
int64_t gj_huffman_encode_segments(
    const int32_t* coeff, int64_t n_blocks,
    const int32_t* block_comp,
    const int32_t* seg_start, const int32_t* seg_count, int64_t n_segments,
    const int32_t* dc_code, const int32_t* dc_size,
    const int32_t* ac_code, const int32_t* ac_size,
    int64_t n_comp,
    uint8_t* out, int64_t out_cap,
    int64_t* seg_offsets)
{
    (void)n_blocks;
    BitWriter bw{out, 0, out_cap, 0, 0, false};
    for (int64_t s = 0; s < n_segments; ++s) {
        seg_offsets[s] = bw.pos;
        int32_t dc_pred[8] = {0};
        const int64_t start = seg_start[s];
        const int64_t end = start + seg_count[s];
        for (int64_t b = start; b < end; ++b) {
            const int ci = block_comp[b];
            const int32_t* dcc = dc_code + (int64_t)ci * 256;
            const int32_t* dcs = dc_size + (int64_t)ci * 256;
            const int32_t* acc_ = ac_code + (int64_t)ci * 256;
            const int32_t* acs = ac_size + (int64_t)ci * 256;
            const int32_t* cz = coeff + b * 64;

            // DC
            int32_t dc = cz[0];
            int32_t diff = dc - dc_pred[ci];
            dc_pred[ci] = dc;
            int cat = category(diff);
            bw_put(bw, dcc[cat], dcs[cat]);
            if (cat) {
                int32_t v = diff >= 0 ? diff : diff + (1 << cat) - 1;
                bw_put(bw, (uint32_t)v, cat);
            }
            // AC
            int run = 0;
            for (int k = 1; k < 64; ++k) {
                int32_t v = cz[k];
                if (v == 0) { ++run; continue; }
                while (run > 15) {
                    bw_put(bw, acc_[0xF0], acs[0xF0]);
                    run -= 16;
                }
                cat = category(v);
                int sym = (run << 4) | cat;
                bw_put(bw, acc_[sym], acs[sym]);
                int32_t bits = v >= 0 ? v : v + (1 << cat) - 1;
                bw_put(bw, (uint32_t)bits, cat);
                run = 0;
            }
            if (run > 0) bw_put(bw, acc_[0x00], acs[0x00]);
            if (bw.overflow) return -1;
        }
        // byte-align with 1-bits (T.81 F.1.2.3)
        if (bw.nbits & 7) {
            int pad = 8 - (bw.nbits & 7);
            bw_put(bw, (1u << pad) - 1, pad);
        }
        if (bw.overflow) return -1;
    }
    seg_offsets[n_segments] = bw.pos;
    return bw.pos;
}

// ---------------------------------------------------------------------------
// Decode
// ---------------------------------------------------------------------------

struct BitReader {
    const uint8_t* data;
    int64_t pos, len;
    uint64_t acc;
    int nbits;
};

static inline void br_fill(BitReader& br, int need) {
    while (br.nbits < need) {
        uint32_t b = 0;
        if (br.pos < br.len) {
            b = br.data[br.pos++];
            if (b == 0xFF && br.pos < br.len && br.data[br.pos] == 0x00)
                ++br.pos;  // skip stuffed zero
        }
        // fake zeros past the end (corrupt-stream guard,
        // reference: gpujpeg_huffman_cpu_decoder.c:155-159)
        br.acc = (br.acc << 8) | b;
        br.nbits += 8;
    }
}

static inline uint32_t br_get(BitReader& br, int n) {
    if (n == 0) return 0;
    br_fill(br, n);
    uint32_t v = (uint32_t)((br.acc >> (br.nbits - n)) & ((1u << n) - 1));
    br.nbits -= n;
    br.acc &= (1ull << br.nbits) - 1;
    return v;
}

static inline uint32_t br_peek16(BitReader& br) {
    br_fill(br, 16);
    return (uint32_t)((br.acc >> (br.nbits - 16)) & 0xFFFF);
}

static inline int32_t extend(uint32_t v, int cat) {
    if (cat == 0) return 0;
    return (int32_t)v >= (1 << (cat - 1)) ? (int32_t)v
                                          : (int32_t)v - (1 << cat) + 1;
}

static inline int decode_symbol(BitReader& br, const int32_t* lut) {
    int32_t entry = lut[br_peek16(br)];
    int length = entry & 0xFF;
    if (length == 0) { br_get(br, 1); return 0; }  // invalid code guard
    br_get(br, length);
    return entry >> 8;
}

// Decode all segments into coeff (n_blocks, 64) int32 (zeroed by caller
// or here). lut16: (n_tables, 65536) int32 packed sym<<8|len.
void gj_huffman_decode_segments(
    const uint8_t* data, int64_t data_len,
    const int64_t* seg_data_start, const int64_t* seg_data_end,
    const int32_t* seg_block_start, const int32_t* seg_block_count,
    int64_t n_segments,
    const int32_t* block_comp, int64_t n_blocks,
    const int32_t* lut16,
    const int32_t* dc_tab, const int32_t* ac_tab,
    int32_t* coeff)
{
    memset(coeff, 0, (size_t)n_blocks * 64 * sizeof(int32_t));
    for (int64_t s = 0; s < n_segments; ++s) {
        int64_t lo = seg_data_start[s], hi = seg_data_end[s];
        if (lo < 0 || hi > data_len || lo >= hi) continue;
        BitReader br{data + lo, 0, hi - lo, 0, 0};
        int32_t dc_pred[8] = {0};
        const int64_t bstart = seg_block_start[s];
        const int64_t bend = bstart + seg_block_count[s];
        for (int64_t b = bstart; b < bend && b < n_blocks; ++b) {
            const int ci = block_comp[b];
            const int32_t* dlut = lut16 + (int64_t)dc_tab[ci] * 65536;
            const int32_t* alut = lut16 + (int64_t)ac_tab[ci] * 65536;
            int32_t* cz = coeff + b * 64;

            int cat = decode_symbol(br, dlut);
            int32_t diff = cat ? extend(br_get(br, cat), cat) : 0;
            dc_pred[ci] += diff;
            cz[0] = dc_pred[ci];
            int k = 1;
            while (k < 64) {
                int sym = decode_symbol(br, alut);
                int run = sym >> 4, c2 = sym & 0xF;
                if (c2 == 0) {
                    if (run == 15) { k += 16; continue; }  // ZRL
                    break;                                  // EOB
                }
                k += run;
                if (k > 63) break;  // corrupt guard (gpujpeg_table.h:64-83)
                cz[k] = extend(br_get(br, c2), c2);
                ++k;
            }
        }
    }
}

// ---------------------------------------------------------------------------
// Scan splitter: find restart-segment boundaries in a scan body
// (reference byte-parse: gpujpeg_reader.c:930-1046). Returns the number of
// segments written, or -(position+1) encoded as negative if no terminating
// marker was found. seg bounds are (start, end) byte offsets into data
// relative to `start`; RST markers excluded. *scan_end gets the offset of
// the terminating 0xFF.
int64_t gj_scan_split(
    const uint8_t* data, int64_t len, int64_t start,
    int64_t* seg_starts, int64_t* seg_ends, int64_t max_segs,
    int64_t* scan_end)
{
    int64_t n = 0;
    int64_t seg_begin = 0;
    const uint8_t* p = data + start;
    const int64_t m = len - start;
    int64_t i = 0;
    while (i + 1 < m) {
        const uint8_t* hit = (const uint8_t*)memchr(p + i, 0xFF, (size_t)(m - i - 1));
        if (!hit) break;
        i = hit - p;
        uint8_t nxt = p[i + 1];
        if (nxt == 0x00) { i += 2; continue; }           // stuffed
        if (nxt >= 0xD0 && nxt <= 0xD7) {                 // RST
            if (i > seg_begin && n < max_segs) {          // drop empty segs
                seg_starts[n] = seg_begin;
                seg_ends[n] = i;
                ++n;
            }
            seg_begin = i + 2;
            i += 2;
            continue;
        }
        // terminating marker
        if (i > seg_begin && n < max_segs) {
            seg_starts[n] = seg_begin;
            seg_ends[n] = i;
            ++n;
        }
        *scan_end = i;
        return n;
    }
    return -(m + 1);
}

// ---------------------------------------------------------------------------
// Decode-side row builder: destuff each segment's bytes into a fixed-pitch
// row matrix of big-endian u32 words (the layout the TPU decode kernel
// consumes). Replaces a per-segment Python loop (~1.8 s at 8K -> ~5 ms).
// rows must be zero-initialized, pitch_words*4 bytes per segment.
int64_t gj_build_rows(
    const uint8_t* data, int64_t data_len,
    const int64_t* lo, const int64_t* hi, int64_t n_segments,
    uint32_t* rows, int64_t pitch_words)
{
    int64_t max_words = 0;
    for (int64_t s = 0; s < n_segments; ++s) {
        int64_t a = lo[s], b = hi[s];
        if (a < 0 || b > data_len || a >= b) continue;
        uint32_t* dst = rows + s * pitch_words;
        int64_t n = 0;
        const int64_t cap = pitch_words * 4;
        uint32_t acc = 0;
        for (int64_t i = a; i < b && n < cap; ++i) {
            uint8_t byte = data[i];
            acc = (acc << 8) | byte;
            if ((n & 3) == 3) dst[n >> 2] = acc;
            ++n;
            if (byte == 0xFF && i + 1 < b && data[i + 1] == 0x00)
                ++i;  // skip stuffed zero
        }
        if (n & 3) dst[n >> 2] = acc << (8 * (4 - (n & 3)));
        int64_t w = (n + 3) >> 2;
        if (w > max_words) max_words = w;
    }
    return max_words;
}

// Column-major variant: writes word w of segment s at rowsT[w*n_cols + s]
// — the exact transposed (Wcap, S_pad) layout the TPU v3 decode kernel
// consumes, so the host-side 8 MB transpose of the row matrix vanishes.
int64_t gj_build_rows_t(
    const uint8_t* data, int64_t data_len,
    const int64_t* lo, const int64_t* hi, int64_t n_segments,
    uint32_t* rowsT, int64_t n_words, int64_t n_cols)
{
    int64_t max_words = 0;
    for (int64_t s = 0; s < n_segments; ++s) {
        int64_t a = lo[s], b = hi[s];
        if (a < 0 || b > data_len || a >= b) continue;
        uint32_t* dst = rowsT + s;
        int64_t n = 0;
        const int64_t cap = n_words * 4;
        uint32_t acc = 0;
        for (int64_t i = a; i < b && n < cap; ++i) {
            uint8_t byte = data[i];
            acc = (acc << 8) | byte;
            if ((n & 3) == 3) dst[(n >> 2) * n_cols] = acc;
            ++n;
            if (byte == 0xFF && i + 1 < b && data[i + 1] == 0x00)
                ++i;  // skip stuffed zero
        }
        if (n & 3) dst[(n >> 2) * n_cols] = acc << (8 * (4 - (n & 3)));
        int64_t w = (n + 3) >> 2;
        if (w > max_words) max_words = w;
    }
    return max_words;
}

}  // extern "C"
