/* Native host fast paths for fuzzy_aho_corasick_tpu.
 *
 * The TPU kernels consume dense symbol-id streams; these routines produce
 * them (and run the bit-parallel prefilter recurrence) at memory-bandwidth
 * speed on the host, replacing NumPy fancy-indexing loops. Compiled on first
 * use by utils/native.py (gcc -O3 -shared), bound via ctypes; every entry
 * point has a NumPy fallback so the package works without a toolchain.
 *
 * Counterpart of the reference's host-side hot paths: the ASCII transcode
 * fast lane (reference src/prefilter.rs:251-259, src/grapheme.rs:76-125) and
 * the shift-AND scan (reference src/prefilter.rs:410-435).
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

/* Byte stream -> symbol ids via a 256-entry table (case folding baked in). */
void transcode_u8(const uint8_t *in, int64_t n, const uint8_t *table,
                  uint8_t *out) {
  for (int64_t i = 0; i < n; i++) {
    out[i] = table[in[i]];
  }
}

/* Byte stream -> int32 symbol ids via a 256-entry int32 table. */
void transcode_i32(const uint8_t *in, int64_t n, const int32_t *table,
                   int32_t *out) {
  for (int64_t i = 0; i < n; i++) {
    out[i] = table[in[i]];
  }
}

/* Bit-parallel Wu-Manber shift-AND scan over k+1 error rows (bit-exact port
 * of the recurrence at reference src/prefilter.rs:410-435). Sets hit[i] = 1
 * for every end position i+1 with levenshtein(pattern, window) <= k; the
 * caller derives candidate windows [end - m - k, end].
 *
 * mask: per-symbol-id bit masks, (alphabet + 1) entries.
 * r, nr: caller-provided scratch of k+1 u64 each (r pre-initialised to the
 *        (1 << d) - 1 start state, so chunks can resume mid-stream).
 */
void bitap_scan(const uint64_t *mask, int32_t m, int32_t k, const uint8_t *ids,
                int64_t n, uint64_t *r, uint64_t *nr, uint8_t *hit) {
  const uint64_t match_bit = 1ULL << (m - 1);
  for (int64_t i = 0; i < n; i++) {
    const uint64_t bc = mask[ids[i]];
    nr[0] = ((r[0] << 1) | 1ULL) & bc;
    for (int32_t d = 1; d <= k; d++) {
      nr[d] = ((r[d] << 1) & bc) | ((r[d - 1] | nr[d - 1]) << 1) | r[d - 1] |
              1ULL;
    }
    hit[i] = (nr[k] & match_bit) != 0;
    /* swap r and nr */
    for (int32_t d = 0; d <= k; d++) {
      uint64_t tmp = r[d];
      r[d] = nr[d];
      nr[d] = tmp;
    }
  }
}

/* Fused transcode + root-step: byte stream -> depth-1 node id (+1; 0 = dead)
 * via a single 256-entry table, so the device can skip its one-hot matmul
 * when the host has cycles to spare. */
void root_step_u8(const uint8_t *in, int64_t n, const int32_t *table,
                  int32_t *out) {
  for (int64_t i = 0; i < n; i++) {
    out[i] = table[in[i]];
  }
}
