"""Gather/scatter-free segment-parallel Huffman encoder (v2).

TPU microarchitecture dictates this design: XLA lowers arbitrary gathers
and scatters to ~11 ns/element serial loops, so the v1 formulation
(scatter codeword bits into the output, gather from code tables) ran
seconds per 8K frame. v2 eliminates both:

* **Code table lookups** run on the VPU's per-lane dynamic-gather unit
  (``tpu.dynamic_gather``, reachable only through Pallas
  ``jnp.take_along_axis`` along lanes, 128-entry tables per vreg): 100M
  lookups ≈ 1 ms. The Annex-K tables are packed as ``code<<5 | len``
  (≤21 bits) and split into 128-entry halves.

* **Bit assembly** is dense math instead of scatter: every block's ≤64
  codeword chunks know their intra-block bit offset (a lane-wise cumsum);
  each of the block's output words is a masked sum of shifted chunk
  contributions (bits are disjoint, so add == or). One Pallas kernel
  fuses symbol synthesis, table lookups, and window assembly per block.

* **Cross-block concatenation** is a logarithmic tree merge over each
  segment's (power-of-two padded) blocks: at every level, the right
  string shifts by the left string's bit length — a per-lane variable
  bit-shift (native VPU) plus a barrel word-roll (log-step selects).

* **Byte stuffing** is a bounded select-chain of rolls: each byte moves
  right by the number of 0xFF bytes before it; skipped output slots are
  exactly the inserted 0x00 stuff bytes.

The whole stage therefore runs on dense vector ops; the only remaining
gathers are tiny (one row per segment). The reference's warp/atomics
pipeline (gpujpeg_huffman_gpu_encoder.cu:191-615) maps to this as:
encode_kernel -> block_chunks (Pallas), serialization -> merge+stuff,
compaction -> host-side prefix-sum slice (unchanged).
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..plan import CoderPlan
from ..tables import HuffmanTable
from ..types import ComponentType, HuffmanType
from .huffman_encode import cap_for_quality

from ..runtime import pallas_call as _pcall, pallas_interpret
I32 = jnp.int32
U32 = jnp.uint32

MAX_STUFF = 255  # max 0xFF bytes per segment handled on device (fits uint8)
#: tier-1 stuffing cap: typical segments stuff ~2 bytes, so 31 (5
#: butterfly stages instead of 8) covers real content; overflow falls
#: back to the tier-2 worst-case geometry like the other caps
MAX_STUFF_T1 = 31


# ---------------------------------------------------------------------------
# Tables: packed (code<<5 | len) entries
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PackedTables:
    ac512: np.ndarray   # (512,) int32: [cls*256 + sym] -> code<<5|len
    dc64: np.ndarray    # (64,)  int32: [cls*32 + cat]  -> code<<5|len
    zrl: np.ndarray     # (2, 2) int32: [cls] -> (code, len)
    eob: np.ndarray     # (2, 2) int32: [cls] -> (code, len)


def build_packed_tables(huff: dict) -> PackedTables:
    ac512 = np.zeros(512, np.int32)
    dc64 = np.zeros(64, np.int32)
    zrl = np.zeros((2, 2), np.int32)
    eob = np.zeros((2, 2), np.int32)
    for ct in (ComponentType.LUMINANCE, ComponentType.CHROMINANCE):
        c = int(ct)
        dc: HuffmanTable = huff[(ct, HuffmanType.DC)]
        ac: HuffmanTable = huff[(ct, HuffmanType.AC)]
        ac512[c * 256:(c + 1) * 256] = \
            (ac.ehufco.astype(np.int64) << 5 | ac.ehufsi).astype(np.int32)
        dc64[c * 32:c * 32 + 16] = \
            (dc.ehufco[:16].astype(np.int64) << 5 | dc.ehufsi[:16]).astype(np.int32)
        zrl[c] = (int(ac.ehufco[0xF0]), int(ac.ehufsi[0xF0]))
        eob[c] = (int(ac.ehufco[0x00]), int(ac.ehufsi[0x00]))
    return PackedTables(ac512, dc64, zrl, eob)


# ---------------------------------------------------------------------------
# Uniform segment geometry: every segment padded to BPS (pow2) blocks
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class UniformGeometry:
    n_segments: int
    bps: int                 # blocks per segment (power of two, padded)
    n_rows: int              # n_segments * bps
    #: (n_rows,) gather index into the scan-order coefficient array;
    #: n_blocks = dummy zero row (padded slots)
    coeff_idx: np.ndarray
    block_cls: np.ndarray    # (n_rows,)
    block_valid: np.ndarray  # (n_rows,)
    #: (n_rows,) distance (in scan order) to the DC predecessor; 0 = none
    dc_dist: np.ndarray
    dc_distances: tuple      # distinct nonzero distances
    seg_rst_marker: np.ndarray  # (S,)
    seg_has_rst: np.ndarray     # (S,)
    words_per_block: int        # W
    cap_seg_words: int          # merged string capacity (words)
    cap_out_bytes: int          # stuffed output region capacity per segment
    max_stuff: int = 255        # stuffing displacement cap (butterfly depth)


def _pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def block_byte_budget(quality: int) -> int:
    """Tier-1 per-block string capacity (bytes). Stage-1 window assembly
    cost is linear in this (W = ceil(cap/4) words per block), so the
    encoder first runs with a typical-content cap — worst legal blocks
    (~209 bytes) overflow, are detected via seg_bits, and re-run on the
    tier-2 worst-case geometry (cap_for_quality)."""
    if quality >= 98:
        return 224
    if quality >= 80:
        return 32   # W=8 (pow2 keeps the packed merge path eligible)
    return 16       # W=4


def seg_budget_for_quality(quality: int, bps: int) -> int:
    """Typical-content per-segment byte budget (tier-1 sizing). Real photo
    blocks at Q75 average ~4-8 bytes; the worst-case cap (cap_for_quality)
    is ~4-8x larger. Merge/stuff cost scales with this, so the encoder
    first runs with this budget and falls back to the worst-case tier
    only when a segment overflows (detected via seg_bits)."""
    if quality >= 98:
        return bps * 96
    if quality >= 90:
        return bps * 40
    if quality >= 80:
        return bps * 20
    if quality >= 50:
        return bps * 14
    return bps * 10


def build_uniform_geometry(plan: CoderPlan,
                           cap_bytes_per_block: int | None = None,
                           rst_marker: np.ndarray | None = None,
                           has_rst: np.ndarray | None = None,
                           seg_byte_budget: int | None = None) -> UniformGeometry:
    if cap_bytes_per_block is None:
        cap_bytes_per_block = cap_for_quality(plan.params.quality)
    S = plan.n_segments
    bps = _pow2(int(plan.max_seg_block_count))
    n_rows = S * bps

    coeff_idx = np.full(n_rows, plan.n_blocks, np.int32)
    cls = np.zeros(n_rows, np.int32)
    valid = np.zeros(n_rows, np.int32)
    dc_dist = np.zeros(n_rows, np.int32)

    starts = plan.seg_block_start
    counts = plan.seg_block_count
    rows = np.arange(n_rows)
    seg = rows // bps
    k = rows % bps
    real = k < counts[seg]
    b = starts[seg] + np.minimum(k, np.maximum(counts[seg] - 1, 0))
    coeff_idx[real] = b[real]
    from .huffman_encode import build_enc_geometry
    g = build_enc_geometry(plan, cap_bytes_per_block)
    cls_all = g.block_cls
    cls[real] = cls_all[b[real]]
    valid[real] = 1
    pred = plan.dc_pred_idx
    dist = np.where(pred >= 0, np.arange(plan.n_blocks) - pred, 0)
    dc_dist[real] = dist[b[real]]
    distances = tuple(sorted(set(int(d) for d in np.unique(dist) if d > 0)))

    W = max(2, (cap_bytes_per_block + 3) // 4)
    if seg_byte_budget is not None:
        cap_seg_words = max(W, -(-seg_byte_budget // 4))
    else:
        cap_seg_words = (int(plan.max_seg_block_count) *
                         cap_bytes_per_block + 3) // 4
    cap_seg_words = -(-cap_seg_words // 4) * 4 + 2
    cap_out = cap_seg_words * 4
    cap_out = cap_out + cap_out // 2 + 8          # stuffing slack + RST
    cap_out = -(-cap_out // 128) * 128
    return UniformGeometry(
        n_segments=S, bps=bps, n_rows=n_rows,
        coeff_idx=coeff_idx, block_cls=cls, block_valid=valid,
        dc_dist=dc_dist, dc_distances=distances,
        seg_rst_marker=(rst_marker if rst_marker is not None
                        else g.seg_rst_marker),
        seg_has_rst=(has_rst if has_rst is not None else g.seg_has_rst),
        words_per_block=W, cap_seg_words=cap_seg_words,
        cap_out_bytes=cap_out,
        max_stuff=MAX_STUFF_T1 if seg_byte_budget is not None else MAX_STUFF,
    )


# ---------------------------------------------------------------------------
# Stage 1 — per-block chunks + window assembly
# ---------------------------------------------------------------------------

def _chunk_planes(c, diff, cls, valid, t):
    """Shared symbol-synthesis math (traceable under XLA or Pallas).

    Args:
      c: (T, 64) int32 zig-zag coefficients.
      diff: (T, 1) int32 DC difference.
      cls/valid: (T, 1) int32.
      t: dict of packed table arrays (ac512, dc64, zrl2, eob2 jnp arrays)
        plus a `lookup(tab, idx, n)` function.

    Returns per-lane SINGLE chunks (val, ln, off): every lane emits at
    most one <= 27-bit string. ZRL codes for runs >= 16 are relocated
    onto the zero lanes they stand for (lane prev+16m emits the m-th
    ZRL — those lanes are otherwise empty, and the offset cumsum orders
    them before their run's terminating code automatically); EOB rides
    in lane 63's otherwise-empty slot. Plus block_bits (T, 1).
    """
    T = c.shape[0]
    k = jax.lax.broadcasted_iota(I32, (T, 64), 1)
    is_dc = k == 0
    v = jnp.where(is_dc, diff, c)
    nz = (v != 0) & (~is_dc)

    av = jnp.abs(v)
    cat = 32 - t["clz"](av)                       # 0 for v == 0
    vbits = jnp.where(v >= 0, v, v + (1 << cat) - 1) & ((1 << cat) - 1)

    # runs of zeros before each nonzero AC
    prev_incl = t["cummax"](jnp.where(nz, k, 0))
    prev = t["shift_lanes_right"](prev_incl, 1)
    run = jnp.where(nz, k - prev - 1, 0)

    # code + value bits (<= 27 bits) for DC / nonzero AC lanes
    sym = ((run & 15) << 4) | cat
    entry_ac = t["lookup512"](cls * 256 + sym)
    entry_dc = t["lookup64"](cls * 32 + jnp.minimum(cat, 15))
    entry = jnp.where(is_dc, entry_dc, entry_ac)
    code = entry >> 5
    clen = entry & 31
    emit = is_dc | nz
    ln = jnp.where(emit, clen + cat, 0)
    val = jnp.where(emit, (code << cat) | vbits, 0)

    # ZRL on the 16th/32nd/48th zero lane of a run that a nonzero ends
    zc = jnp.where(cls > 0, t["zrl_c"][0], t["zrl_l"][0])
    zl = jnp.where(cls > 0, t["zrl_c"][1], t["zrl_l"][1])
    d = k - prev
    has_next = t["shift_lanes_left"](t["revmax"](nz.astype(I32)), 1)
    is_zrl = (~is_dc) & (~nz) & (has_next > 0) & (d >= 16) & ((d & 15) == 0)
    ln = jnp.where(is_zrl, zl, ln) * valid
    val = jnp.where(is_zrl, zc, val)

    csum = t["cumsum"](ln)
    off = csum - ln
    pre_eob_bits = csum[:, 63:64]

    # EOB in lane 63: c[63] == 0 implies lane 63 emits nothing, and its
    # offset (= pre_eob_bits) is exactly where EOB belongs
    has_eob = (c[:, 63:64] == 0) & (valid > 0)
    ec = jnp.where(cls > 0, t["eob_c"][0], t["eob_l"][0])
    el = jnp.where(cls > 0, t["eob_c"][1], t["eob_l"][1])
    lane63 = k == 63
    ln = jnp.where(lane63 & has_eob, el, ln)
    val = jnp.where(lane63 & has_eob, ec, val)

    block_bits = pre_eob_bits + jnp.where(has_eob, el, 0)
    return val, ln, off, block_bits


def _srl(x, n):
    """Logical (unsigned) right shift on int32 lanes."""
    return jax.lax.shift_right_logical(x, n)


def _windows(val, ln, off, W: int):
    """Dense window assembly: (T, W) words from per-lane single chunks
    (<= 27 bits each, so a chunk spans at most two adjacent words).

    Runs in int32 (Mosaic cannot reduce unsigned ints): `<<` wraps mod
    2^32 and right shifts are explicit logical shifts, so the math is
    exactly the uint32 math the merge stage expects; the final convert
    to uint32 is a mod-2^32 reinterpretation."""
    out = []
    for w in range(W):
        rel = off - 32 * w
        sh = 32 - rel - ln
        pos_sh = jnp.clip(sh, 0, 31)
        neg_sh = jnp.clip(-sh, 0, 31)
        contrib = jnp.where(sh >= 0, val << pos_sh, _srl(val, neg_sh))
        mask = (ln > 0) & (rel < 32) & (rel + ln > 0)
        total = jnp.where(mask, contrib, 0)
        out.append(jnp.sum(total, axis=1, keepdims=True, dtype=I32))
    return jnp.concatenate(out, axis=1).astype(U32)


# ---- XLA reference implementation (CPU fallback + oracle) ----

def _xla_helpers(tabs: PackedTables):
    ac512 = jnp.asarray(tabs.ac512)
    dc64 = jnp.asarray(tabs.dc64)
    return {
        "clz": jax.lax.clz,
        "cummax": lambda x: jax.lax.cummax(x, axis=1),
        "revmax": lambda x: jax.lax.cummax(x, axis=1, reverse=True),
        "cumsum": lambda x: jnp.cumsum(x, axis=1),
        "shift_lanes_right": lambda x, s: jnp.concatenate(
            [jnp.zeros((x.shape[0], s), x.dtype), x[:, :-s]], axis=1),
        "shift_lanes_left": lambda x, s: jnp.concatenate(
            [x[:, s:], jnp.zeros((x.shape[0], s), x.dtype)], axis=1),
        "lookup512": lambda i: ac512[i],
        "lookup64": lambda i: dc64[i],
        "zrl_l": tuple(int(v) for v in tabs.zrl[0]),
        "zrl_c": tuple(int(v) for v in tabs.zrl[1]),
        "eob_l": tuple(int(v) for v in tabs.eob[0]),
        "eob_c": tuple(int(v) for v in tabs.eob[1]),
    }


def block_chunks_xla(coeff, diff, cls, valid, tabs: PackedTables, W: int):
    """(N, 64) coeffs -> (N, W) uint32 local words + (N, 1) bit lengths."""
    t = _xla_helpers(tabs)
    val, ln, off, bits = _chunk_planes(
        coeff, diff, cls[:, None], valid[:, None], t)
    return _windows(val, ln, off, W), bits


# ---- Pallas TPU implementation ----

def _pallas_helpers(ac512_ref, dc128_ref, tabs: PackedTables):
    # per-lane dynamic gather in a broadcast 128-entry table row — the
    # same helper the decode kernels use
    from .pallas_decode import _gather128 as lane_gather128

    def lookup512(idx):
        lo = idx & 127
        h = idx >> 7                      # 0..3
        r0 = lane_gather128(ac512_ref[0:128], lo)
        r1 = lane_gather128(ac512_ref[128:256], lo)
        r2 = lane_gather128(ac512_ref[256:384], lo)
        r3 = lane_gather128(ac512_ref[384:512], lo)
        return jnp.where(h == 0, r0,
                         jnp.where(h == 1, r1,
                                   jnp.where(h == 2, r2, r3)))

    def lookup64(idx):
        return lane_gather128(dc128_ref, idx)

    def cummax(x):
        T, L = x.shape
        lane = jax.lax.broadcasted_iota(I32, (T, L), 1)
        s = 1
        while s < L:
            sh = jnp.concatenate(
                [jnp.full((T, s), jnp.iinfo(jnp.int32).min, x.dtype),
                 x[:, :-s]], axis=1)
            x = jnp.maximum(x, jnp.where(lane >= s, sh, x))
            s <<= 1
        return x

    def cumsum(x):
        T, L = x.shape
        lane = jax.lax.broadcasted_iota(I32, (T, L), 1)
        s = 1
        while s < L:
            sh = jnp.concatenate(
                [jnp.zeros((T, s), x.dtype), x[:, :-s]], axis=1)
            x = x + jnp.where(lane >= s, sh, 0)
            s <<= 1
        return x

    return {
        "clz": jax.lax.clz,
        "cummax": cummax,
        "cumsum": cumsum,
        "shift_lanes_right": lambda x, s: jnp.concatenate(
            [jnp.zeros((x.shape[0], s), x.dtype), x[:, :-s]], axis=1),
        "lookup512": lookup512,
        "lookup64": lookup64,
        "zrl_l": tuple(int(v) for v in tabs.zrl[0]),
        "zrl_c": tuple(int(v) for v in tabs.zrl[1]),
        "eob_l": tuple(int(v) for v in tabs.eob[0]),
        "eob_c": tuple(int(v) for v in tabs.eob[1]),
    }


def _chunk_planes_packed(c, diff2, cls2, valid2, t, W: int):
    """Two-blocks-per-row variant of :func:`_chunk_planes` + windows.

    All (tile, 64) arrays of the unpacked formulation waste half of every
    vreg (Mosaic pads the 64-lane minor dim to 128); here two consecutive
    blocks share each 128-lane row, halving the vector-op count.

    v3 op-count reductions over the original formulation (the kernel is
    measured compute-bound at ~1 cycle/vreg-op, so vector-op count is the
    whole cost):

    * one fused prefix scan: code lengths, nonzero counts and ZRL
      candidate counts ride in disjoint bit fields of a single masked
      cumsum (replaces a cumsum + a suffix-max scan). ZRL lengths are
      per-class constants, so offsets = len-prefix + zl * candidate-
      prefix; candidates in a block's zero tail (which must emit EOB
      instead) are counted from lane 63's run distance and subtracted.
    * the DC-run cummax runs on global lane indices with DC lanes as
      chain resetters — shift-in zeros need no per-step boundary mask.
    * window assembly: each lane's chunk spans at most two 32-bit words,
      so its two aligned parts are computed once; per output word a
      select picks the contributing part and a 6-step shift-OR tree
      reduces each 64-lane half (bits are disjoint, OR == add). Replaces
      W full masked-cumsum reductions.

    c: (T2, 128) int32 — blocks 2i (lanes 0-63) and 2i+1 (lanes 64-127).
    diff2/cls2/valid2: (T2, 2) int32 per-block scalars.
    Returns (words (T2, 2W) uint32, bits (T2, 2) int32).
    """
    T2 = c.shape[0]
    lane = jax.lax.broadcasted_iota(I32, (T2, 128), 1)
    left = lane < 64

    def expand(a2):
        return jnp.where(left, a2[:, 0:1], a2[:, 1:2])

    return _chunk_planes_lanes(c, expand(diff2), expand(cls2),
                               expand(valid2), t, W)


def _chunk_planes_lanes(c, diff, cls, valid, t, W: int):
    """Core of :func:`_chunk_planes_packed` with per-lane (T2, 128)
    ``diff``/``cls``/``valid`` operands (``diff`` is read only at the DC
    lanes 0/64), so fused callers can derive them in-kernel without the
    narrow (T2, 2) input streams."""
    T2 = c.shape[0]
    lane = jax.lax.broadcasted_iota(I32, (T2, 128), 1)
    k = lane & 63
    left = lane < 64

    def shift_r(x, s, fill=0):
        return jnp.concatenate(
            [jnp.full((T2, s), fill, x.dtype), x[:, :-s]], axis=1)

    is_dc = k == 0
    v = jnp.where(is_dc, diff, c)
    nz = (v != 0) & (~is_dc)

    av = jnp.abs(v)
    cat = 32 - t["clz"](av)
    vbits = jnp.where(v >= 0, v, v + (1 << cat) - 1) & ((1 << cat) - 1)

    # previous emit position via global-lane cummax; DC lanes reset the
    # chain, so shift-in zeros cannot leak across the block boundary
    tv = jnp.where(nz | is_dc, lane, 0)
    s = 1
    while s < 64:
        tv = jnp.maximum(tv, shift_r(tv, s))
        s <<= 1
    prev = shift_r(tv, 1)
    d = lane - prev                     # block-local distance (same block)
    run = jnp.where(nz, d - 1, 0)

    sym = ((run & 15) << 4) | cat
    entry_ac = t["lookup512"](cls * 256 + sym)
    entry_dc = t["lookup64"](cls * 32 + jnp.minimum(cat, 15))
    entry = jnp.where(is_dc, entry_dc, entry_ac)
    code = entry >> 5
    clen = entry & 31
    emit = is_dc | nz
    ln0 = jnp.where(emit, clen + cat, 0) * valid
    val = jnp.where(emit, (code << cat) | vbits, 0)

    # ZRL candidates: the 16th/32nd/48th zero lane of a run (real only
    # when a nonzero follows in-block; tail candidates are fake)
    zc = jnp.where(cls > 0, t["zrl_c"][0], t["zrl_l"][0])
    zl = jnp.where(cls > 0, t["zrl_c"][1], t["zrl_l"][1])
    cand = ((~is_dc) & (~nz) & (d >= 16) & ((d & 15) == 0) &
            (valid > 0))

    # fused masked scan: ln0 (<= 3008 total, 12 bits) | nz << 12 | cand << 19
    combo = ln0 + (nz.astype(I32) << 12) + (cand.astype(I32) << 19)
    s = 1
    while s < 64:
        combo = combo + jnp.where(k >= s, shift_r(combo, s), 0)
        s <<= 1
    csum_ln = combo & 0xFFF             # inclusive prefix of ln0
    cnz = (combo >> 12) & 0x7F          # inclusive prefix of nz
    ccand = combo >> 19                 # inclusive prefix of cand

    # per-block totals broadcast from lanes 63 / 127 (static gather)
    bidx = jnp.where(left, 63, 127)
    tot = jnp.take_along_axis(combo, bidx, axis=1)
    tot_nz = (tot >> 12) & 0x7F

    real = cand & (cnz < tot_nz)        # zero tail -> EOB, not ZRL
    ln = jnp.where(real, zl, ln0)
    val = jnp.where(real, zc, val)
    off = (csum_ln - ln0) + zl * (ccand - cand.astype(I32))

    # EOB rides in each block's lane 63 when its last AC is zero; fake
    # (tail) candidates are the multiples of 16 inside lane 63's run
    is63 = k == 63
    czero63 = (c == 0) & is63 & (valid > 0)
    ec = jnp.where(cls > 0, t["eob_c"][0], t["eob_l"][0])
    el = jnp.where(cls > 0, t["eob_c"][1], t["eob_l"][1])
    fake = jnp.where(czero63, d >> 4, 0)
    real_tot = (tot >> 19) - jnp.take_along_axis(fake, bidx, axis=1)
    base_bits = (tot & 0xFFF) + zl * real_tot
    ln = jnp.where(czero63, el, ln)
    val = jnp.where(czero63, ec, val)
    off = jnp.where(czero63, base_bits, off)
    eob_len = jnp.where(czero63, el, 0)

    # window assembly: chunk at [off, off+ln) splits into word j = off>>5
    # and word j+1; per word a select + shift-OR tree over each 64-lane
    # half (read at lanes 0 / 64 — cross-boundary leakage lands only on
    # lanes that are never read)
    r = off & 31
    j = _srl(off, 5)
    s0 = 32 - r - ln
    part0 = jnp.where(s0 >= 0, val << jnp.clip(s0, 0, 31),
                      _srl(val, jnp.clip(-s0, 0, 31)))
    part0 = jnp.where(ln > 0, part0, 0)
    part1 = jnp.where((s0 < 0) & (ln > 0),
                      val << jnp.clip(32 + s0, 0, 31), 0)
    # OR == ADD here: chunks occupy DISJOINT bit ranges of each word
    # (consecutive bitstream positions), so per word the two half-block
    # reductions are ONE MXU matmul against a static (128, 2) half
    # indicator — exact via a 16-bit split (each half-sum stays a
    # 16-bit field, no carries, well under f32's 2^24). Replaces the
    # 6-step shift-OR tree per word. (A masked cross-lane SUM reduce
    # form was tried first and REJECTED by the Mosaic scheduler — a
    # 17.5M scoped-VMEM plan vs the 16M budget at every tile size, the
    # rgb-kernel plan-selection cliff; the matmul form schedules
    # through the MXU pipeline instead.)
    hm_r = jax.lax.broadcasted_iota(I32, (128, 2), 0)
    hm_c = jax.lax.broadcasted_iota(I32, (128, 2), 1)
    Hm = ((hm_r < 64) == (hm_c == 0)).astype(jnp.float32)
    cols_l, cols_r = [], []
    for w in range(W):
        contrib = jnp.where(j == w, part0, 0)
        if w > 0:
            contrib = contrib | jnp.where(j == w - 1, part1, 0)
        lo = (contrib & 0xFFFF).astype(jnp.float32)
        hi = _srl(contrib, 16).astype(jnp.float32)
        slo = jax.lax.dot_general(
            lo, Hm, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).astype(I32)
        shi = jax.lax.dot_general(
            hi, Hm, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).astype(I32)
        word2 = slo | (shi << 16)           # (T2, 2): [left, right]
        cols_l.append(word2[:, 0:1])
        cols_r.append(word2[:, 1:2])
    words = jnp.concatenate(cols_l + cols_r, axis=1).astype(U32)

    bsum = base_bits + eob_len
    bits = jnp.concatenate([bsum[:, 63:64], bsum[:, 127:128]], axis=1)
    return words, bits


def block_chunks_pallas(coeff, diff, cls, valid, tabs: PackedTables, W: int,
                        tile: int = 2048):
    """Pallas version of :func:`block_chunks_xla` (TPU only), two blocks
    per 128-lane row."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # in-kernel live set grows ~linearly with W (the (T2, 2W) window +
    # per-word synthesis chains): the 8K Q90 point (W=56) asked 63.7M
    # scoped VMEM at the W=4-tuned tile. Scale inversely, 16-block
    # (8-row) aligned.
    if W > 4:
        tile = max(16, (tile * 4 // W) // 16 * 16)

    N = coeff.shape[0]
    pad = (-N) % tile
    if pad:
        coeff = jnp.pad(coeff, ((0, pad), (0, 0)))
        diff = jnp.pad(diff, ((0, pad), (0, 0)))
        cls = jnp.pad(cls, (0, pad))
        valid = jnp.pad(valid, (0, pad))
        N += pad
    ac512 = jnp.asarray(tabs.ac512)
    dc128 = jnp.asarray(np.concatenate([tabs.dc64, np.zeros(64, np.int32)]))

    T2 = tile // 2
    c2 = coeff.reshape(N // 2, 128)
    d2 = diff.reshape(N // 2, 2)
    cls2 = cls.reshape(N // 2, 2)
    val2 = valid.reshape(N // 2, 2)

    def kernel(coeff_ref, diff_ref, cls_ref, valid_ref, ac_ref, dc_ref,
               words_ref, bits_ref):
        t = _pallas_helpers(ac_ref[:], dc_ref[:], tabs)
        words_ref[:], bits_ref[:] = _chunk_planes_packed(
            coeff_ref[:], diff_ref[:], cls_ref[:], valid_ref[:], t, W)

    grid = (N // tile,)
    words, bits = _pcall(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((N // 2, 2 * W), jnp.uint32),
                   jax.ShapeDtypeStruct((N // 2, 2), jnp.int32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T2, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T2, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T2, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T2, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((512,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((128,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T2, 2 * W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T2, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )(c2, d2, cls2, val2, ac512, dc128)
    words = words.reshape(N, W)
    bits = bits.reshape(N, 1)
    if pad:
        words = words[:-pad]
        bits = bits[:-pad]
    return words, bits


def block_chunks_dct_pallas(pb2, diff2, cls2, valid2, qidx, D2_h, bias2_h,
                            q2tab_h, tabs: PackedTables, W: int,
                            tile: int = 768):
    """DCT+quant fused into the stage-1 entropy kernel: the (n_rows, 64)
    i32 coefficient tensor (800 MB of HBM round-trip at 8K on this
    chip's ~150 GB/s effective bandwidth) never exists — the MXU matmul
    runs on the tile in VMEM and feeds symbol synthesis directly.

    pb2 (N/2, 128) u8 pixels two blocks per row (level shift folded in
    bias); diff2 (N/2, 2) i32 DC differences (computed by a separate
    DC-only pass, bit-identical to column 0/64 of this matmul);
    cls2/valid2 (N/2, 2); qidx (N/2, 1) row index into q2tab_h.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = pb2.shape[0]                  # N/2 rows
    T2 = tile // 2
    pad = (-M) % T2
    if pad:
        pb2 = jnp.pad(pb2, ((0, pad), (0, 0)))
        diff2 = jnp.pad(diff2, ((0, pad), (0, 0)))
        cls2 = jnp.pad(cls2, ((0, pad), (0, 0)))
        valid2 = jnp.pad(valid2, ((0, pad), (0, 0)))
        qidx = jnp.pad(qidx, ((0, pad), (0, 0)))
        M += pad
    ac512 = jnp.asarray(tabs.ac512)
    dc128 = jnp.asarray(np.concatenate([tabs.dc64, np.zeros(64, np.int32)]))
    D2 = jnp.asarray(D2_h)
    n_q2 = q2tab_h.shape[0]
    bq = jnp.asarray(np.concatenate([bias2_h[None, :], q2tab_h], axis=0)
                     .astype(np.float32))                    # (1+n_q2, 128)

    def kernel(pb_ref, diff_ref, cls_ref, valid_ref, qi_ref, d2_ref, bq_ref,
               ac_ref, dc_ref, words_ref, bits_ref):
        xf = pb_ref[:].astype(jnp.int32).astype(jnp.float32)
        y = jax.lax.dot_general(
            xf, d2_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32) - bq_ref[0:1, :]
        qi = qi_ref[:]
        qv = jnp.broadcast_to(bq_ref[1:2, :], y.shape)
        for i in range(1, n_q2):
            qv = jnp.where(qi == i,
                           jnp.broadcast_to(bq_ref[1 + i:2 + i, :], y.shape),
                           qv)
        rows = jnp.rint(y / qv).astype(I32)
        t = _pallas_helpers(ac_ref[:], dc_ref[:], tabs)
        words_ref[:], bits_ref[:] = _chunk_planes_packed(
            rows, diff_ref[:], cls_ref[:], valid_ref[:], t, W)

    words, bits = _pcall(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((M, 2 * W), jnp.uint32),
                   jax.ShapeDtypeStruct((M, 2), jnp.int32)),
        grid=(M // T2,),
        in_specs=[
            pl.BlockSpec((T2, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T2, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T2, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T2, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T2, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1 + n_q2, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((512,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((128,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T2, 2 * W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T2, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )(pb2, diff2, cls2, valid2, qidx, D2, bq, ac512, dc128)
    words = words.reshape(2 * M, W)
    bits = bits.reshape(2 * M, 1)
    if pad:
        words = words[:-2 * pad]
        bits = bits[:-2 * pad]
    return words, bits


@dataclasses.dataclass(frozen=True)
class FusedSpec:
    """Static per-geometry facts letting the fused kernel derive class /
    validity / quantizer / DC-prediction in-kernel, eliminating every
    narrow per-row input stream (measured ~1.1 ms per stream at 8K).

    Applies to identity-gather non-interleaved plans: scan order ==
    uniform row order, consecutive blocks within a segment (DC-prediction
    distance 1), components concatenated at static block boundaries.
    """
    #: per-component (start_block, cls, quant_row_index); start of comp 0
    #: is 0; blocks >= boundary i belong to component i
    comp_starts: tuple
    comp_cls: tuple
    comp_q: tuple
    n_real_blocks: int
    seg_rows: int          # rows (block pairs) per segment; 0 <=> bps == 1


def fused_dct_inputs(plan, quant_zz, seg_rows: int):
    """Build the fused-kernel operator set for a plan: (spec, D2_h,
    bias2_h, qrows_h) — the block-diagonal two-block DCT operator, the
    doubled level-shift bias, per-quant-table doubled divisor rows and
    the static component FusedSpec. ``seg_rows`` is the geometry's
    ``bps // 2``. Single source of truth shared by the production
    pipeline (:mod:`jax_pipeline`) and the perf scripts."""
    from ..tables import dct_zigzag_operator
    D64, bias64 = dct_zigzag_operator()
    n_qt = max(c.quant_table_index for c in plan.components) + 1
    n_q = max(n_qt, 2)
    qdiv_h = np.ones((n_q, 64), np.float32)
    for qi in range(n_q):
        if qi in quant_zz:
            qdiv_h[qi] = np.maximum(
                np.asarray(quant_zz[qi], np.float32), 1.0)
    D2_h = np.zeros((128, 128), np.float32)
    D2_h[:64, :64] = D64
    D2_h[64:, 64:] = D64
    bias2_h = np.concatenate([bias64, bias64]).astype(np.float32)
    qrows_h = np.stack([np.concatenate([qdiv_h[q], qdiv_h[q]])
                        for q in range(n_q)]).astype(np.float32)
    starts, clss, qs = [], [], []
    pos = 0
    for c in plan.components:
        starts.append(pos)
        clss.append(int(c.comp_type))
        qs.append(int(c.quant_table_index))
        pos += c.block_count
    spec = FusedSpec(comp_starts=tuple(starts), comp_cls=tuple(clss),
                     comp_q=tuple(qs), n_real_blocks=plan.n_blocks,
                     seg_rows=seg_rows)
    return spec, D2_h, bias2_h, qrows_h


def _stage1_dct_tile(pb_ref, d2_ref, bq_ref, ac_ref, dc_ref,
                     spec: FusedSpec, tabs: PackedTables, W: int, T2: int,
                     seg_rows: int, n_comp: int, row0=None, xb=None,
                     cls_over=None, qv_over=None):
    """One grid step of the fused stage 1: unpack packed pixel words,
    DCT+quant on the MXU, in-kernel DC prediction, symbol synthesis and
    window assembly. Returns (words (T2, 2W) uint32, bits (T2, 2) int32
    with per-block capacity overflow folded in as a 1<<20 offset).

    ``pb_ref`` may be a ref or an already-sliced (T2, 32) array;
    ``row0`` is the tile's first global block-pair row (defaults to
    ``program_id(0) * T2`` — sub-tiled callers pass their own offset;
    a sub-tile must start at a segment-start row). With ``xb`` the
    caller passes (T2, 128) pixel bytes already one per lane (the
    rgb-fused kernel, which color-transforms in-kernel) and
    ``pb_ref`` is ignored."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental import pallas as pl

    if row0 is None:
        row0 = pl.program_id(0) * T2
    lane = jax.lax.broadcasted_iota(I32, (T2, 128), 1)
    rowi = jax.lax.broadcasted_iota(I32, (T2, 128), 0)

    if xb is None:
        # unpack the 4-per-word pixel bytes to one byte per lane
        xw = jnp.pad(pb_ref[:], ((0, 0), (0, 96)))
        g = jnp.take_along_axis(xw, _srl(lane, 2), axis=1)
        xb = _srl(g, (lane & 3) * 8) & 255
    xf = xb.astype(jnp.float32)
    prec = (jax.lax.Precision.DEFAULT
            if os.environ.get("GPUJPEG_TPU_DCT_FAST")
            else jax.lax.Precision.HIGHEST)
    y = jax.lax.dot_general(
        xf, d2_ref[:], (((1,), (0,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32) - bq_ref[0:1, :]
    blk = 2 * (row0 + rowi) + (lane >= 64).astype(I32)
    # cls_over/qv_over: runtime per-lane class / quantizer-row overrides
    # (the rgb kernel's component index is a grid id, so its constants
    # can't be baked statically)
    cls = (cls_over if cls_over is not None
           else jnp.full((T2, 128), spec.comp_cls[0], I32))
    qv = (qv_over if qv_over is not None
          else jnp.broadcast_to(bq_ref[1 + spec.comp_q[0]:
                                       2 + spec.comp_q[0], :], y.shape))
    for i in range(1, n_comp):
        past = blk >= spec.comp_starts[i]
        if spec.comp_cls[i] != spec.comp_cls[i - 1]:
            cls = jnp.where(past, spec.comp_cls[i], cls)
        if spec.comp_q[i] != spec.comp_q[i - 1]:
            qv = jnp.where(past, jnp.broadcast_to(
                bq_ref[1 + spec.comp_q[i]:2 + spec.comp_q[i], :],
                y.shape), qv)
    valid = (blk < spec.n_real_blocks).astype(I32)
    rows = jnp.rint(y / qv).astype(I32)

    # DC differences from the quantized DC lanes: previous block of a
    # row's left block is the previous row's right block (reset at
    # segment-start rows); of the right block, the left one.
    dc_l = rows[:, 0:1]
    dc_r = rows[:, 64:65]
    if seg_rows == 0:          # bps == 1: every block starts a segment
        diff_l, diff_r = dc_l, dc_r
    else:
        # previous row's right-block DC; the wrap row is always a
        # segment start (tiles are segment-aligned), so it masks out
        prev_l = pltpu.roll(dc_r, 1, axis=0)
        rstart = ((row0 + rowi[:, 0:1]) % seg_rows) == 0
        diff_l = dc_l - jnp.where(rstart, 0, prev_l)
        diff_r = dc_r - dc_l
    lane_left = lane < 64
    diff = jnp.where(lane_left, diff_l, diff_r)

    t = _pallas_helpers(ac_ref[:], dc_ref[:], tabs)
    words, bits = _chunk_planes_lanes(rows, diff, cls, valid, t, W)
    # per-block capacity overflow folds into the bit length so it
    # survives the merge into segment totals (host checks seg_bits)
    bits = bits + jnp.where(bits > W * 32, 1 << 20, 0)
    return words, bits


def block_chunks_dct_fused(pbw, spec: FusedSpec, D2_h, bias2_h, qrows_h,
                           tabs: PackedTables, W: int, tile: int = 768,
                           min_rows: int = 0):
    """Fully fused stage 1 with zero narrow input streams: DCT+quant on
    the MXU, DC differences from the quantized DC lanes (previous block
    = previous lane-64/row slot; resets at segment-start rows), class /
    validity / quantizer from static block-index thresholds.

    pbw (M, 32) int32 — two blocks per row, pixel bytes packed 4-per-word
    little-endian (:func:`blocks.plane_to_blocks_u32`; the u8 blockify
    transpose costs 4x more). qrows_h (n_comp, 128) f32 per-component
    quant divisors tiled twice. Returns a single combined (Mp, 2W+2)
    int32 array: lanes [0, 2W) window words (bit pattern), lanes
    [2W, 2W+2) per-block bit lengths, with per-block capacity overflow
    (> W*32 bits) folded in as a 1<<20 offset so it survives the merge
    into the segment totals. Mp = max(M, min_rows) padded to the tile —
    pass the merge stage's padded row count as ``min_rows`` so no
    downstream re-pad (a full-array copy) is needed.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = pbw.shape[0]
    T2 = tile // 2
    target = max(M, min_rows)
    pad = (-target) % T2 + (target - M)
    if pad:
        pbw = jnp.pad(pbw, ((0, pad), (0, 0)))
    Mp = M + pad
    ac512 = jnp.asarray(tabs.ac512)
    dc128 = jnp.asarray(np.concatenate([tabs.dc64, np.zeros(64, np.int32)]))
    D2 = jnp.asarray(D2_h)
    n_comp = len(spec.comp_starts)
    bq = jnp.asarray(np.concatenate(
        [bias2_h[None, :], qrows_h], axis=0).astype(np.float32))
    n_bq = int(bq.shape[0])
    seg_rows = spec.seg_rows

    def kernel(pb_ref, d2_ref, bq_ref, ac_ref, dc_ref, out_ref):
        words, bits = _stage1_dct_tile(
            pb_ref, d2_ref, bq_ref, ac_ref, dc_ref, spec, tabs, W, T2,
            seg_rows, n_comp)
        out_ref[:] = jnp.concatenate(
            [jax.lax.bitcast_convert_type(words, I32), bits], axis=1)

    out = _pcall(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, 2 * W + 2), jnp.int32),
        grid=(Mp // T2,),
        in_specs=[
            pl.BlockSpec((T2, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bq, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((512,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((128,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T2, 2 * W + 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(pbw, D2, bq, ac512, dc128)
    return out, Mp


def _pack_rows_lanes(x, lanes_out: int):
    """In-kernel row-major relayout ``(R, C) -> (R*C/lanes_out,
    lanes_out)`` for ``C < 128``.

    Mosaic rejects the direct shape cast (``tpu.reshape
    vector<RxCxi32> -> ...`` "unsupported shape cast" on real
    hardware — the interpreter accepts it, which is why this shipped
    broken once). The supported route: pad the lane dim to a full
    vreg, collapse whole 128-lane rows into the lane axis (vreg-aligned
    reshape, same family as the merge kernels' (rows,128)->(rows/2,256)
    pairing trick), then compact with static lane slices."""
    Rr, C = x.shape
    g = lanes_out // C
    assert lanes_out % C == 0 and Rr % g == 0, (x.shape, lanes_out)
    if C == 128:
        return x
    y = jnp.pad(x, ((0, 0), (0, 128 - C)))
    y = y.reshape(Rr // g, g * 128)
    return jnp.concatenate(
        [y[:, 128 * j:128 * j + C] for j in range(g)], axis=1)


def band_perm_rows() -> np.ndarray:
    """Input-byte permutation of the band-input kernel: lane ``l`` of a
    pair row holds plane byte (row ``r = (l>>2)&7``, in-pair column
    ``cb = 4*(l>>5) + (l&3)``) after the in-kernel transpose+row-collapse
    relayout. Returns ``m`` with ``m[l]`` = that byte's block-row-major
    index (the order the pbw path feeds the DCT), so the band operator
    is ``D2_h[band_perm_rows()]`` — the matmul absorbs the relayout."""
    l = np.arange(128)
    q, r, b = l >> 5, (l >> 2) & 7, l & 3
    cb = 4 * q + b
    return (cb >= 8) * 64 + r * 8 + (cb & 7)


def encode_dct_fused_full(pbw, rst_marker, has_rst, spec: FusedSpec,
                          D2_h, bias2_h, qrows_h, tabs: PackedTables,
                          W: int, bps: int, cap_words: int, cap_out: int,
                          max_stuff: int = MAX_STUFF, tile: int = 768,
                          band_ppb: int = 0):
    """The WHOLE entropy encode in ONE kernel: fused DCT+quant+stage-1
    plus the packed tree merge, byte stuffing and RST append of
    :func:`merge_stuff_packed` — for the flagship geometry
    (``bps * W == 128``, identity row order, segment-aligned tiles).

    The merge/stuff arithmetic runs on ``2*T2*W/128``-row arrays (16x
    fewer vregs than stage 1 at W=4), so its in-kernel cost is small,
    while the separate-kernel version pays its own grid overhead plus
    an HBM round trip of the (n_rows, W) window array. The relayout from
    the (T2, 2W) window layout to the (segments, 128) packed merge
    layout is an in-VMEM reshape.

    pbw (M, 32) int32 packed pixel words; rst_marker/has_rst (S_pad, 1)
    int32 with S_pad == ceil(M*2/bps) padded to whole tiles by the
    caller (min_rows alignment). Returns (out u8-view (S_pad*cap_out,),
    out_len, seg_bits, n_ff) — the contract of :func:`merge_and_stuff`.

    With ``band_ppb > 0`` (equal-width planes, 16-pixel-aligned rows),
    ``pbw`` is instead the row-concatenated plane WORDS
    (plane_rows, band_ppb*4) int32 — the 8x8 blockify runs in-VMEM
    inside the kernel (2D transpose + row-collapse) instead of as an
    XLA transpose through HBM (measured 15.8 ms of the 34.5 ms 8K
    encode; the in-kernel form ~3.7 ms and the packed-block array never
    exists in HBM). The relayout's byte order folds into the DCT
    operator (:func:`band_perm_rows`) — the caller must pass
    ``D2_h[band_perm_rows()]``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T2 = tile // 2
    if band_ppb:
        plane_rows = pbw.shape[0]
        assert pbw.shape[1] == band_ppb * 4, (pbw.shape, band_ppb)
        assert plane_rows % 8 == 0
        M = plane_rows // 8 * band_ppb
        assert T2 % band_ppb == 0, (T2, band_ppb)
    else:
        M = pbw.shape[0]
    assert bps * W == 128 and cap_out % 4 == 0
    assert (2 * T2) % bps == 0 and (T2 * 2 * W) % 128 == 0
    assert M % T2 == 0, (M, T2)
    spt_t = 2 * T2 // bps              # segments per grid tile
    S_pad = 2 * M // bps
    assert rst_marker.shape[0] == S_pad, (rst_marker.shape, S_pad)
    n_comp = len(spec.comp_starts)
    seg_rows = spec.seg_rows
    WO = cap_out // 4
    mrows_t = T2 * 2 * W // 128        # packed merge rows per tile

    # sub-tiled stage 1 (GPUJPEG_TPU_FUSED_SUBTILES=KS): the kernel
    # loops over KS segment-aligned sub-slices of its tile, so the
    # per-grid-step fixed cost (prologue, DMA sync) amortizes over a
    # KS-times-larger tile while the simultaneously-live vreg set stays
    # the size of ONE sub-tile — the recompute-over-hold restructuring
    # of the round-2 calibration (BENCHMARKS.md: live set fills scoped
    # VMEM at the optimal tile, killing double-buffering)
    KS = int(os.environ.get("GPUJPEG_TPU_FUSED_SUBTILES", "1") or 1)
    if KS < 1 or T2 % KS or (2 * (T2 // KS)) % bps \
            or ((T2 // KS) * 2 * W) % 128 \
            or (2 * (T2 // KS) // bps) % 8 \
            or (band_ppb and (T2 // KS) % band_ppb):
        KS = 1    # sub-slice out_ref row offsets must stay 8-aligned
    T2s = T2 // KS                     # block-pair rows per sub-tile
    spt_s = 2 * T2s // bps             # segments per sub-tile
    Ksub = T2s // band_ppb if band_ppb else 0   # plane 8-row bands/sub

    ac512 = jnp.asarray(tabs.ac512)
    dc128 = jnp.asarray(np.concatenate([tabs.dc64, np.zeros(64, np.int32)]))
    D2 = jnp.asarray(D2_h)
    bq = jnp.asarray(np.concatenate(
        [bias2_h[None, :], qrows_h], axis=0).astype(np.float32))
    n_bq = int(bq.shape[0])

    def kernel(pb_ref, r_ref, h_ref, d2_ref, bq_ref, ac_ref, dc_ref,
               out_ref, meta_ref):
        from jax.experimental import pallas as pl
        pid = pl.program_id(0)
        for sub in range(KS):
            if band_ppb:
                # in-VMEM blockify: per plane 8-row band, a 2D transpose
                # then the Mosaic row-collapse — byte order absorbed by
                # the permuted DCT operator (band_perm_rows)
                pb = jnp.concatenate([
                    _pack_rows_lanes(jnp.transpose(
                        pb_ref[8 * (sub * Ksub + kb):
                               8 * (sub * Ksub + kb + 1)]), 32)
                    for kb in range(Ksub)], axis=0)
            else:
                pb = pb_ref[sub * T2s:(sub + 1) * T2s]
            words, bits = _stage1_dct_tile(
                pb, d2_ref, bq_ref,
                ac_ref, dc_ref, spec, tabs, W, T2s, seg_rows, n_comp,
                row0=pid * T2 + sub * T2s)
            # relayout to the packed merge layout: rows of 128/W whole
            # block strings (row-major flatten == block-major word order)
            w2 = _pack_rows_lanes(words, 128)
            b2 = _pack_rows_lanes(bits, 128 // W)
            out_w, meta = _merge_stuff_core(
                w2, b2, r_ref[sub * spt_s:(sub + 1) * spt_s],
                h_ref[sub * spt_s:(sub + 1) * spt_s], W, cap_words, WO,
                max_stuff)
            out_ref[sub * spt_s:(sub + 1) * spt_s] = out_w
            meta_ref[sub * spt_s:(sub + 1) * spt_s] = meta

    if band_ppb:
        pb_spec = pl.BlockSpec((T2 // band_ppb * 8, band_ppb * 4),
                               lambda i: (i, 0), memory_space=pltpu.VMEM)
    else:
        pb_spec = pl.BlockSpec((T2, 32), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    out_w, meta = _pcall(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S_pad, WO), jnp.uint32),
                   jax.ShapeDtypeStruct((S_pad, 8), jnp.int32)),
        grid=(M // T2,),
        in_specs=[
            pb_spec,
            pl.BlockSpec((spt_t, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spt_t, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bq, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((512,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((128,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((spt_t, WO), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spt_t, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(pbw, rst_marker, has_rst, D2, bq, ac512, dc128)
    seg_bits = meta[:, 0]
    n_ff = meta[:, 1]
    out_len = meta[:, 2]
    return out_w.reshape(-1), out_len, seg_bits, n_ff


def rgb_transform_consts(cs_from, cs_to):
    """Static (matrix9, base3) for the in-kernel forward color transform
    of the words front end (ops/rgbpack.py); ``()`` for identity; ``None`` when
    the pair is not expressible as one forward fixed-point matrix (the
    caller falls back to the XLA preprocess)."""
    from ..types import ColorSpace
    from .colorspace import MATRIX_TO
    cs_from, cs_to = ColorSpace(cs_from), ColorSpace(cs_to)
    if cs_from in (cs_to, ColorSpace.NONE) or cs_to == ColorSpace.NONE:
        return ()
    if cs_from == ColorSpace.RGB and cs_to in MATRIX_TO:
        return MATRIX_TO[cs_to]
    return None


def split_fused_output(out, Mp: int, n_keep: int, W: int):
    """Combined (Mp, 2W+2) -> (words (n_keep, W) u32, bits (n_keep, 1)
    i32). With ``n_keep == 2 * Mp`` the slices vanish (arrange via
    ``min_rows`` so the padded rows coincide with the merge stage's
    segment padding and no copy happens here)."""
    words = jax.lax.bitcast_convert_type(out[:, :2 * W], jnp.uint32)
    bits = out[:, 2 * W:]
    words = words.reshape(2 * Mp, W)
    bits = bits.reshape(2 * Mp, 1)
    if n_keep != 2 * Mp:
        words = words[:n_keep]
        bits = bits[:n_keep]
    return words, bits


# ---------------------------------------------------------------------------
# Stage 2 — tree merge of block strings into segment strings
# ---------------------------------------------------------------------------

def _word_roll_right(x, o):
    """Barrel roll: shift each row right by o (per-row) words."""
    R = x.shape[1]
    bit = 1
    while bit < R:
        sh = jnp.concatenate(
            [jnp.zeros((x.shape[0], bit), x.dtype), x[:, :-bit]], axis=1)
        x = jnp.where((o & bit) > 0, sh, x)
        bit <<= 1
    return x


def _merge_pair(lw, lb, rw, rb, R_out: int):
    """Concatenate bit strings: (left words, left bits) + (right ...)."""
    rows = lw.shape[0]
    R_in = lw.shape[1]
    lw = jnp.pad(lw, ((0, 0), (0, R_out - R_in)))
    rw = jnp.pad(rw, ((0, 0), (0, R_out - R_in)))
    sh = (lb & 31).astype(U32)                    # (rows, 1)
    prev = jnp.concatenate(
        [jnp.zeros((rows, 1), rw.dtype), rw[:, :-1]], axis=1)
    lo = jnp.where(sh > 0, rw >> sh, rw)
    hi = jnp.where(sh > 0, prev << ((32 - sh) & 31).astype(U32), 0)
    shifted = lo | hi
    rolled = _word_roll_right(shifted, lb >> 5)
    return lw | rolled, lb + rb


def merge_segments_pallas(words, bits, bps: int, cap_words: int,
                          seg_tile: int = 64):
    """Pallas tree merge: whole merge runs in VMEM per 128-segment tile,
    with the barrel word-roll collapsed into one per-lane dynamic gather
    (idx = lane - offset). Requires cap_words <= 126 (one vreg of lanes)
    and power-of-two bps; the XLA merge handles the rest.

    The pairwise reshape trick keeps everything contiguous: a (rows, R)
    level array viewed as (rows/2, 2R) puts the left string in lanes
    [0,R) and the right in [R,2R) — no strided row slicing."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, W = words.shape
    S = n_rows // bps
    S_pad = -(-S // seg_tile) * seg_tile
    if S_pad != S:
        words = jnp.pad(words, ((0, (S_pad - S) * bps), (0, 0)))
        bits = jnp.pad(bits, ((0, (S_pad - S) * bps), (0, 0)))

    def kernel(w_ref, b_ref, out_w_ref, out_b_ref):
        # strings live in 128-lane rows at every level so the pairing
        # reshape (rows,128)->(rows/2,256) stays lane-aligned for Mosaic;
        # each string's bit length rides in spare lane 127 (cap <= 126)
        rows0 = w_ref.shape[0]
        lane0 = jax.lax.broadcasted_iota(I32, (rows0, 128), 1)
        x = jnp.pad(w_ref[:], ((0, 0), (0, 128 - W)))   # (tile*bps, 128)
        x = jnp.where(lane0 == 127, b_ref[:].astype(U32), x)
        blocks = bps
        while blocks > 1:
            rows = x.shape[0]
            x2 = x.reshape(rows // 2, 256)
            lw = x2[:, :128]
            rw = x2[:, 128:]
            lb = lw[:, 127:128].astype(I32)
            rb = rw[:, 127:128].astype(I32)
            lane = jax.lax.broadcasted_iota(I32, (rows // 2, 128), 1)
            lw = jnp.where(lane == 127, 0, lw)
            rw = jnp.where(lane == 127, 0, rw)
            # bit shift with carry from the previous word
            sh = (lb & 31).astype(U32)
            prev = jnp.concatenate(
                [jnp.zeros((rows // 2, 1), rw.dtype), rw[:, :-1]], axis=1)
            lo = jnp.where(sh > 0, rw >> sh, rw)
            hi = jnp.where(sh > 0, prev << ((32 - sh) & 31).astype(U32), 0)
            shifted = lo | hi
            # word roll as one per-lane gather: dst lane l reads l - o
            o = lb >> 5
            src = lane - o
            rolled = jnp.take_along_axis(shifted, jnp.clip(src, 0, 127),
                                         axis=1)
            rolled = jnp.where(src >= 0, rolled, 0)
            x = lw | rolled
            x = jnp.where(lane == 127, (lb + rb).astype(U32), x)
            blocks //= 2
        out_w_ref[:] = x[:, :cap_words]
        out_b_ref[:] = x[:, 127:128].astype(I32)

    out_w, out_b = _pcall(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S_pad, cap_words), jnp.uint32),
                   jax.ShapeDtypeStruct((S_pad, 1), jnp.int32)),
        grid=(S_pad // seg_tile,),
        in_specs=[
            pl.BlockSpec((seg_tile * bps, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg_tile * bps, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((seg_tile, cap_words), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(words, bits)
    return out_w[:S], out_b[:S, 0]


def _merge_level_packed(x, blen, R: int, lane):
    """One packed merge level: pair-concatenate adjacent R-lane strings
    inside their 2R-lane window, in place. x (T, L) uint32 words, blen
    (T, L) int32 bit lengths replicated across each string's lanes."""
    L = x.shape[1]
    T = x.shape[0]
    loc = lane & (2 * R - 1)
    base = lane - loc
    # blen is replicated per string, so the window's left/right lengths
    # are static R-lane shifts of it (cheaper than dynamic gathers)
    is_r = loc >= R
    bl_r = jnp.concatenate([jnp.zeros((T, R), blen.dtype),
                            blen[:, :-R]], axis=1)
    bl_l = jnp.concatenate([blen[:, R:],
                            jnp.zeros((T, R), blen.dtype)], axis=1)
    lb = jnp.where(is_r, bl_r, blen)
    rb = jnp.where(is_r, blen, bl_l)
    sh = (lb & 31).astype(U32)
    o = lb >> 5
    v = jnp.where(is_r, x, 0)
    prev = jnp.concatenate([jnp.zeros((x.shape[0], 1), x.dtype),
                            v[:, :-1]], axis=1)
    lo = jnp.where(sh > 0, v >> sh, v)
    hi = jnp.where(sh > 0, prev << ((32 - sh) & 31).astype(U32), 0)
    shifted = lo | hi
    # word roll: dst lane d reads the shifted right string at d - o + R
    src = lane + R - o
    rolled = jnp.take_along_axis(shifted, jnp.clip(src, 0, L - 1), axis=1)
    # bit-shifting a full R-word right string spills its last sh bits
    # into a virtual word R (local index 2R) past the window
    tail = jnp.take_along_axis(v, base + (2 * R - 1), axis=1)
    spill = jnp.where(sh > 0, tail << ((32 - sh) & 31).astype(U32), 0)
    rolled = jnp.where((loc >= o) & (loc - o < R), rolled,
                       jnp.where(loc - o == R, spill, 0))
    return jnp.where(is_r, 0, x) | rolled, lb + rb


def _merge_level_cross(x, blen, R: int):
    """Row-pair merge level for strings wider than a vreg: x (rows, 2R)
    with the left string in lanes [0, R) and the right in [R, 2R),
    R >= 128. Mosaic's per-lane dynamic gather spans at most 128 lanes,
    so the word roll runs per 128-lane destination chunk, selecting from
    the (at most two) source slices it straddles."""
    rows = x.shape[0]
    lb = blen[:, 0:1]
    rb = blen[:, R:R + 1]
    sh = (lb & 31).astype(U32)
    o = lb >> 5
    v = x[:, R:]
    prev = jnp.concatenate([jnp.zeros((rows, 1), x.dtype), v[:, :-1]], axis=1)
    lo = jnp.where(sh > 0, v >> sh, v)
    hi = jnp.where(sh > 0, prev << ((32 - sh) & 31).astype(U32), 0)
    spill = jnp.where(sh > 0, v[:, R - 1:R] << ((32 - sh) & 31).astype(U32),
                      0)
    shifted = jnp.concatenate([lo | hi, spill], axis=1)     # (rows, R + 1)
    chunks = []
    for c in range(0, 2 * R, 128):
        dst = jax.lax.broadcasted_iota(I32, (rows, 128), 1) + c
        src = dst - o                                       # in [0, R] valid
        rolled = jnp.zeros((rows, 128), x.dtype)
        for s0 in range(0, R + 1, 128):
            sl = shifted[:, s0:s0 + 128]
            if sl.shape[1] < 128:
                sl = jnp.pad(sl, ((0, 0), (0, 128 - sl.shape[1])))
            idx = src - s0
            part = jnp.take_along_axis(sl, jnp.clip(idx, 0, 127), axis=1)
            rolled = jnp.where((idx >= 0) & (idx < 128), part, rolled)
        rolled = jnp.where((src >= 0) & (src <= R), rolled, 0)
        left = jnp.where(dst < R, x[:, c:c + 128], 0)
        chunks.append(left | rolled)
    x2 = jnp.concatenate(chunks, axis=1)
    return x2, jnp.broadcast_to(lb + rb, (rows, 2 * R))


def merge_segments_packed(words, bits, bps: int, W: int, cap_words: int,
                          seg_tile: int = 256):
    """Fully lane-packed Pallas tree merge (TPU).

    Level-0 block strings (W words each) are packed 128/W per 128-lane
    row — a free row-major reshape of the (N, W) window array — so every
    merge level runs at full vreg occupancy (the unpacked kernel spends
    its early levels on rows that are >90% padding; at 8K Q75 this is
    the difference between ~18 ms and ~1 ms). Strings pair-merge in
    place inside their 2R-lane window; segments wider than 128 lanes
    (bps*W > 128) finish with row-pair levels via the 2x-lane reshape.
    Requires pow2 bps and W; any cap_words. Capacity overflow (segment
    bits beyond bps*W*32) self-masks in the roll and surfaces through
    the returned bit lengths, matching the other merge paths."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, _ = words.shape
    S = n_rows // bps
    P = bps * W                          # lanes per segment string
    bpr = 128 // W                       # blocks per 128-lane row
    spt = max(1, seg_tile * 128 // P)    # segments per grid tile
    S_pad = -(-S // spt) * spt
    if S_pad != S:
        pad = (S_pad - S) * bps
        words = jnp.pad(words, ((0, pad), (0, 0)))
        bits = jnp.pad(bits, ((0, pad), (0, 0)))
    rows0 = S_pad * P // 128
    w2 = words.reshape(rows0, 128)
    b2 = bits.reshape(rows0, bpr)

    log2W = W.bit_length() - 1
    n_cross = (P // 128).bit_length() - 1 if P > 128 else 0
    R_f = max(P, 128)
    tile_f = seg_tile >> n_cross

    def kernel(w_ref, b_ref, out_w_ref, out_b_ref):
        x = w_ref[:]
        T = x.shape[0]
        lane = jax.lax.broadcasted_iota(I32, (T, 128), 1)
        bpad = jnp.pad(b_ref[:], ((0, 0), (0, 128 - bpr)))
        blen = jnp.take_along_axis(bpad, lane >> log2W, axis=1)
        R = W
        while R < min(P, 128):
            x, blen = _merge_level_packed(x, blen, R, lane)
            R *= 2
        while R < P:
            rows = x.shape[0]
            x = x.reshape(rows // 2, 2 * R)
            blen = blen.reshape(rows // 2, 2 * R)
            x, blen = _merge_level_cross(x, blen, R)
            R *= 2
        out_w_ref[:] = x
        out_b_ref[:] = blen

    out_w, out_b = _pcall(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((rows0 >> n_cross, R_f), jnp.uint32),
                   jax.ShapeDtypeStruct((rows0 >> n_cross, R_f), jnp.int32)),
        grid=(rows0 // seg_tile,),
        in_specs=[
            pl.BlockSpec((seg_tile, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg_tile, bpr), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_f, R_f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_f, R_f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(w2, b2)
    segs = out_w.reshape(S_pad, P)[:S]
    segb = out_b.reshape(S_pad, P)[:S, 0]
    if cap_words <= P:
        return segs[:, :cap_words], segb
    return jnp.pad(segs, ((0, 0), (0, cap_words - P))), segb


def _stuff_core(w, bits, rmark, hrst, WO: int, max_stuff: int):
    """Shared in-VMEM byte-plane stuffing + RST append — the SINGLE
    implementation both stuffing kernels call (they must stay bit-exact
    in lockstep for stream byte-identity).

    w (T, WO) i32 big-endian segment words zero-padded past the string;
    bits (T, 1) i32 segment bit lengths; rmark/hrst (T, 1) i32. The
    whole segment stays in VMEM as four byte-plane arrays (plane p =
    bytes ≡ p mod 4), so a byte shift by 2^b decomposes into a static
    plane permutation plus a word-lane shift (collision-free MSB-first
    butterfly: see :func:`stuff_and_rst`). Returns (out_words (T, WO)
    u32 LE-packed, n_ff (T, 1), out_len (T, 1))."""
    T = w.shape[0]
    b0 = max(0, min(max_stuff, 255).bit_length() - 1)
    lane_o = jax.lax.broadcasted_iota(I32, (T, WO), 1)
    pad_bits = (-bits) & 7
    seg_len = (bits + pad_bits) >> 3
    last = bits >> 3
    fill = (1 << pad_bits) - 1

    planes = []
    for p in range(4):
        xb = _srl(w, 8 * (3 - p)) & 255
        g = lane_o * 4 + p
        xb = jnp.where(g == last, xb | fill, xb)
        xb = jnp.where(g < seg_len, xb, 0)
        planes.append(xb)

    is_ff = [(planes[p] == 0xFF).astype(I32) for p in range(4)]
    cnt = is_ff[0] + is_ff[1] + is_ff[2] + is_ff[3]
    # exclusive word-prefix of FF counts over lanes
    cum = cnt
    s = 1
    while s < WO:
        sh = jnp.concatenate(
            [jnp.zeros((T, s), I32), cum[:, :-s]], axis=1)
        cum = cum + sh
        s <<= 1
    cum_ex = cum - cnt
    nff = cum[:, WO - 1:WO]

    disp = []
    acc = cum_ex
    for p in range(4):
        g = lane_o * 4 + p
        disp.append(jnp.where(g < seg_len,
                              jnp.minimum(acc, max_stuff), 0))
        acc = acc + is_ff[p]

    for b in range(b0, -1, -1):
        step = 1 << b
        np_, nd_ = [], []
        for p in range(4):
            ps = (p - step) % 4
            sh = (step + ps - p) // 4
            if sh:
                src_a = jnp.concatenate(
                    [jnp.zeros((T, sh), I32), planes[ps][:, :-sh]],
                    axis=1)
                src_d = jnp.concatenate(
                    [jnp.zeros((T, sh), I32), disp[ps][:, :-sh]],
                    axis=1)
            else:
                src_a, src_d = planes[ps], disp[ps]
            smv = (_srl(src_d, b) & 1) > 0
            mmv = (_srl(disp[p], b) & 1) > 0
            np_.append(jnp.where(smv, src_a,
                                 jnp.where(mmv, 0, planes[p])))
            nd_.append(jnp.where(smv, src_d - step,
                                 jnp.where(mmv, 0, disp[p])))
        planes, disp = np_, nd_

    stuffed = seg_len + jnp.minimum(nff, max_stuff)
    hr = hrst > 0
    for p in range(4):
        g = lane_o * 4 + p
        planes[p] = jnp.where(hr & (g == stuffed), 0xFF, planes[p])
        planes[p] = jnp.where(hr & (g == stuffed + 1), rmark, planes[p])

    out_w = (planes[0] | (planes[1] << 8) | (planes[2] << 16) |
             (planes[3] << 24)).astype(U32)
    return out_w, nff, stuffed + 2 * hrst


def _merge_stuff_core(x, b2, rmark, hrst, W: int, cap_words: int,
                      WO: int, max_stuff: int):
    """In-kernel core of the packed merge + byte stuffing + RST append
    (P = bps*W == 128 geometry). x (T, 128) uint32 — 128/W block strings
    per row (whole segments); b2 (T, 128//W) i32 per-block bit lengths;
    rmark/hrst (T, 1) i32. Returns (out_words (T, WO) u32 LE-packed,
    meta (T, 8) i32 = [seg_bits, n_ff, out_len, 0...])."""
    T = x.shape[0]
    bpr = 128 // W
    log2W = W.bit_length() - 1
    lane = jax.lax.broadcasted_iota(I32, (T, 128), 1)
    bpad = jnp.pad(b2, ((0, 0), (0, 128 - bpr)))
    blen = jnp.take_along_axis(bpad, lane >> log2W, axis=1)
    R = W
    while R < 128:
        x, blen = _merge_level_packed(x, blen, R, lane)
        R *= 2

    # ---- stuffing on the merged segment strings (in VMEM) ----
    # strings physically cap at P = 128 words even when the logical
    # cap_words is larger (tier-2 worst-case caps)
    cw = min(cap_words, 128)
    bits_c = blen[:, 0:1]
    w = jnp.pad(x[:, :cw].astype(I32), ((0, 0), (0, WO - cw)))
    out_w, nff, out_len = _stuff_core(w, bits_c, rmark, hrst, WO,
                                      max_stuff)
    meta = jnp.concatenate(
        [bits_c, nff, out_len, jnp.zeros((T, 5), I32)], axis=1)
    return out_w, meta


def merge_stuff_packed(words, bits, rst_marker, has_rst, bps: int, W: int,
                       cap_words: int, cap_out: int,
                       max_stuff: int = MAX_STUFF, seg_tile: int = 256):
    """Packed tree merge + byte stuffing + RST append in ONE kernel
    (P = bps*W == 128 lanes per segment string only — the flagship
    geometry). Fusing removes the (S, cap_words) segment-string HBM
    round trip between the two stages and their narrow side streams.

    Returns (out_words (S, cap_out//4) u32 LE-packed, out_len (S,),
    seg_bits (S,), n_ff (S,)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, _ = words.shape
    S = n_rows // bps
    P = bps * W
    assert P == 128 and cap_out % 4 == 0
    bpr = 128 // W
    S_pad = -(-S // seg_tile) * seg_tile
    if S_pad != S:
        pad = (S_pad - S) * bps
        words = jnp.pad(words, ((0, pad), (0, 0)))
        bits = jnp.pad(bits, ((0, pad), (0, 0)))
    rst_marker = jnp.pad(rst_marker, (0, S_pad - rst_marker.shape[0]))
    has_rst = jnp.pad(has_rst, (0, S_pad - has_rst.shape[0]))
    rows0 = S_pad
    w2 = words.reshape(rows0, 128)
    b2 = bits.reshape(rows0, bpr)
    WO = cap_out // 4

    def kernel(w_ref, b_ref, r_ref, h_ref, out_ref, meta_ref):
        out_w, meta = _merge_stuff_core(
            w_ref[:], b_ref[:], r_ref[:], h_ref[:], W, cap_words, WO,
            max_stuff)
        out_ref[:] = out_w
        meta_ref[:] = meta

    out_w, meta = _pcall(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S_pad, WO), jnp.uint32),
                   jax.ShapeDtypeStruct((S_pad, 8), jnp.int32)),
        grid=(rows0 // seg_tile,),
        in_specs=[
            pl.BlockSpec((seg_tile, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg_tile, bpr), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((seg_tile, WO), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg_tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(w2, b2, rst_marker[:, None].astype(jnp.int32),
      has_rst[:, None].astype(jnp.int32))
    return (out_w[:S], meta[:S, 2], meta[:S, 0], meta[:S, 1])


def merge_segments(words, bits, bps: int, cap_words: int):
    """(S*bps, W) block strings -> (S, cap_words) segment strings + bits."""
    n_rows, W = words.shape
    R = W
    lv_words = words
    lv_bits = bits
    blocks = bps
    while blocks > 1:
        R_out = min(2 * R, cap_words)
        lw = lv_words[0::2]
        rw = lv_words[1::2]
        lb = lv_bits[0::2]
        rb = lv_bits[1::2]
        lv_words, lv_bits = _merge_pair(lw, lb, rw, rb, R_out)
        R = R_out
        blocks //= 2
    if R < cap_words:
        lv_words = jnp.pad(lv_words, ((0, 0), (0, cap_words - R)))
    return lv_words, lv_bits[:, 0]


# ---------------------------------------------------------------------------
# Stage 3 — byte stuffing + RST append (byte-per-lane domain)
# ---------------------------------------------------------------------------



def stuff_and_rst_pallas(seg_words, seg_bits, rst_marker, has_rst,
                         cap_out: int, max_stuff: int = MAX_STUFF,
                         tile: int = 256):
    """Pallas byte-plane version of :func:`stuff_and_rst` (TPU).

    The XLA formulation materializes (S, cap_out) byte arrays (promoted
    to i32 lanes) across every butterfly stage — ~10 ms of HBM traffic
    at 8K on this chip. Here the whole segment stays in VMEM as four
    byte-plane arrays of (S, cap_out/4) i32 (plane p = bytes = p mod 4),
    so byte shifts by 2^b decompose into a static plane permutation plus
    a word-lane shift. Output is (S, cap_out/4) uint32 words packing the
    byte stream little-endian (bitcast to bytes outside).

    Returns (out_words (S, cap_out//4) u32, n_ff (S,) i32).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, CW = seg_words.shape
    WO = cap_out // 4
    # live set scales with the per-segment word footprint: the 8K Q100
    # point (CW=770, WO=1184) asked 28.1M scoped VMEM at the Q75-tuned
    # tile of 256. Scale inversely, anchored at the Q75 footprint.
    load, base = CW + WO, 340
    if load > base:
        tile = max(8, (tile * base // load) // 8 * 8)
    S_pad = -(-S // tile) * tile
    if S_pad != S:
        seg_words = jnp.pad(seg_words, ((0, S_pad - S), (0, 0)))
        seg_bits = jnp.pad(seg_bits, (0, S_pad - S))
        rst_marker = jnp.pad(rst_marker, (0, S_pad - S))
        has_rst = jnp.pad(has_rst, (0, S_pad - S))

    def kernel(w_ref, b_ref, r_ref, h_ref, out_ref, nff_ref):
        w = jnp.pad(w_ref[:], ((0, 0), (0, WO - CW))).astype(I32)
        out_w, nff, _ = _stuff_core(w, b_ref[:], r_ref[:], h_ref[:], WO,
                                    max_stuff)
        out_ref[:] = out_w
        nff_ref[:] = nff

    out_w, nff = _pcall(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S_pad, WO), jnp.uint32),
                   jax.ShapeDtypeStruct((S_pad, 1), jnp.int32)),
        grid=(S_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, CW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, WO), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(seg_words, seg_bits[:, None], rst_marker[:, None].astype(jnp.int32),
      has_rst[:, None].astype(jnp.int32))
    return out_w[:S], nff[:S, 0]


def stuff_and_rst(seg_words, seg_bits, rst_marker, has_rst, cap_out: int,
                  max_stuff: int = MAX_STUFF):
    """(S, CW) uint32 big-endian words -> (S, cap_out) uint8 stuffed bytes
    with byte-align padding and RST markers; returns (out, out_len, n_ff).

    Runs in the uint8 domain (4x vreg density vs int32): displacements
    fit in a byte because MAX_STUFF <= 255.
    """
    S, CW = seg_words.shape
    capB = CW * 4
    U8 = jnp.uint8

    # unpack words to byte lanes (static strided writes)
    by = jnp.zeros((S, capB), U8)
    w = seg_words
    by = by.at[:, 0::4].set((w >> 24).astype(U8))
    by = by.at[:, 1::4].set((w >> 16).astype(U8))
    by = by.at[:, 2::4].set((w >> 8).astype(U8))
    by = by.at[:, 3::4].set(w.astype(U8))

    # byte-align: pad final partial byte with 1-bits (T.81 F.1.2.3)
    pad = (-seg_bits) & 7
    seg_len = (seg_bits + pad) >> 3
    idx = jax.lax.broadcasted_iota(I32, (S, capB), 1)
    last = (seg_bits >> 3)[:, None]
    by = jnp.where(idx == last, by | ((1 << pad) - 1)[:, None].astype(U8), by)
    valid = idx < seg_len[:, None]
    by = jnp.where(valid, by, 0)

    is_ff = (by == 0xFF) & valid
    pref = jnp.cumsum(is_ff.astype(I32), axis=1)
    pref_ex = (pref - is_ff)
    n_ff = pref[:, -1]

    # Forward-route each byte right by the number of 0xFF bytes before it.
    # Displacements are non-decreasing along the row, so an MSB-first
    # butterfly (conditional shift by 2^b per stage) is collision-free:
    # floor(p/2^b)*2^b stays monotone, hence injective at every stage.
    # Slots nothing routes to are exactly the inserted 0x00 stuff bytes.
    arr = jnp.pad(by, ((0, 0), (0, cap_out - capB)))
    disp = jnp.where(jnp.pad(valid, ((0, 0), (0, cap_out - capB))),
                     jnp.pad(jnp.minimum(pref_ex, max_stuff).astype(U8),
                             ((0, 0), (0, cap_out - capB))),
                     jnp.uint8(0))
    b = min(max_stuff, 255).bit_length() - 1
    while (1 << b) >= cap_out:
        b -= 1
    zero8 = jnp.uint8(0)
    while b >= 0:
        step = 1 << b
        move = (disp >> b) & 1
        arr_s = jnp.concatenate(
            [jnp.zeros((S, step), U8), arr[:, :-step]], axis=1)
        disp_s = jnp.concatenate(
            [jnp.zeros((S, step), U8), disp[:, :-step]], axis=1)
        move_s = jnp.concatenate(
            [jnp.zeros((S, step), U8), move[:, :-step]], axis=1)
        arr = jnp.where(move_s > 0, arr_s, jnp.where(move > 0, zero8, arr))
        disp = jnp.where(move_s > 0, disp_s - jnp.uint8(step),
                         jnp.where(move > 0, zero8, disp))
        b -= 1
    out = arr

    stuffed_len = seg_len + jnp.minimum(n_ff, max_stuff)
    oidx = jax.lax.broadcasted_iota(I32, (S, cap_out), 1)
    rpos = stuffed_len[:, None]
    hr = (has_rst > 0)[:, None]
    out = jnp.where(hr & (oidx == rpos), jnp.uint8(0xFF), out)
    out = jnp.where(hr & (oidx == rpos + 1),
                    rst_marker[:, None].astype(U8), out)
    out_len = stuffed_len + 2 * has_rst
    return out, out_len, n_ff


# ---------------------------------------------------------------------------
# Full entropy encode (drop-in for huffman_encode_kernel, uniform geometry)
# ---------------------------------------------------------------------------

def dc_diff(dc, dc_dist, distances):
    """DC differences via static shifts (no gather): dc (N,) in scan order,
    dc_dist (N_rows,) distance to predecessor in scan order (0 = none)."""
    prev = jnp.zeros_like(dc)
    for d in distances:
        sh = jnp.concatenate([jnp.zeros((d,), dc.dtype), dc[:-d]])
        prev = jnp.where(dc_dist == d, sh, prev)
    return dc - prev


def encode_rows_arrays(rows, cls, valid, dc_dist, rst_marker, has_rst,
                       distances: tuple, bps: int, cap_seg_words: int,
                       cap_out_bytes: int, W: int,
                       tabs: PackedTables, use_pallas: bool,
                       max_stuff: int = MAX_STUFF):
    """Traced-array core of :func:`encode_rows` (geometry as tensors so
    large plans can ``lax.map`` over segment chunks)."""
    diff_rows = dc_diff(rows[:, 0], dc_dist, distances)[:, None]

    if use_pallas:
        words, bits = block_chunks_pallas(rows, diff_rows, cls, valid, tabs, W)
    else:
        words, bits = block_chunks_xla(rows, diff_rows, cls, valid, tabs, W)
    return merge_and_stuff(words, bits, rst_marker, has_rst, bps,
                           cap_seg_words, cap_out_bytes, W, use_pallas,
                           max_stuff)


def merge_and_stuff(words, bits, rst_marker, has_rst, bps: int,
                    cap_seg_words: int, cap_out_bytes: int, W: int,
                    use_pallas: bool, max_stuff: int = MAX_STUFF):
    """Stages 2+3: tree-merge block strings into segment strings, byte
    stuff, append RST. Per-block capacity overflow (> W*32 bits) folds
    into that block's bit length (1<<20 offset) so the merged segment
    total trips the host's seg_bits-vs-cap check; stuffing overflow
    (n_ff > max_stuff) is checked by the host against the returned n_ff
    directly."""
    bits = bits + jnp.where((bits > W * 32) & (bits < (1 << 20)),
                            1 << 20, 0)
    pow2 = lambda v: v > 0 and (v & (v - 1)) == 0  # noqa: E731
    if (use_pallas and bps > 1 and pow2(bps) and pow2(W)
            and bps * W == 128 and cap_out_bytes % 4 == 0):
        out, out_len, seg_bits, n_ff = merge_stuff_packed(
            words, bits, rst_marker, has_rst, bps, W, cap_seg_words,
            cap_out_bytes, max_stuff)
        return out.reshape(-1), out_len, seg_bits, n_ff
    if use_pallas and bps > 1 and pow2(bps) and pow2(W) and bps * W <= 512:
        seg_words, seg_bits = merge_segments_packed(words, bits, bps, W,
                                                    cap_seg_words)
    elif use_pallas and cap_seg_words <= 126 and bps > 1 and pow2(bps):
        seg_words, seg_bits = merge_segments_pallas(words, bits, bps,
                                                    cap_seg_words)
    else:
        seg_words, seg_bits = merge_segments(words, bits, bps, cap_seg_words)
    if use_pallas and cap_out_bytes % 4 == 0:
        # out stays uint32 (little-endian byte packing); the host views
        # it as bytes — an on-device bitcast costs a ~3 ms relayout
        out, n_ff = stuff_and_rst_pallas(
            seg_words, seg_bits, rst_marker, has_rst, cap_out_bytes,
            max_stuff)
        seg_len = (seg_bits + ((-seg_bits) & 7)) >> 3
        out_len = seg_len + jnp.minimum(n_ff, max_stuff) + 2 * has_rst
    else:
        out, out_len, n_ff = stuff_and_rst(
            seg_words, seg_bits, rst_marker, has_rst, cap_out_bytes,
            max_stuff)
    return out.reshape(-1), out_len, seg_bits, n_ff


def encode_rows(rows, geo: UniformGeometry, tabs: PackedTables,
                use_pallas: bool, rst_marker=None, has_rst=None):
    """Entropy-encode uniform-layout coefficient rows.

    rows: (n_rows, 64) int32 — segment-uniform layout (geo.coeff_idx
    applied by the caller; padded rows arbitrary, masked by block_valid).

    Returns (out u8 (S*cap_out,), out_len (S,), seg_bits (S,), n_ff (S,))
    — the contract of huffman_encode_kernel. Capacity overflow (block
    string > W words, or > MAX_STUFF stuffed bytes) is folded into
    seg_bits so the host's single seg_bits-vs-cap check catches it."""
    return encode_rows_arrays(
        rows, jnp.asarray(geo.block_cls), jnp.asarray(geo.block_valid),
        jnp.asarray(geo.dc_dist),
        jnp.asarray(geo.seg_rst_marker) if rst_marker is None else rst_marker,
        jnp.asarray(geo.seg_has_rst) if has_rst is None else has_rst,
        geo.dc_distances, geo.bps, geo.cap_seg_words, geo.cap_out_bytes,
        geo.words_per_block, tabs, use_pallas, geo.max_stuff)


def encode_entropy_v2(coeff_scan, geo: UniformGeometry, tabs: PackedTables,
                      use_pallas: bool):
    """coeff_scan: (n_blocks, 64) int32 scan-order zig-zag coefficients."""
    coeff_idx = jnp.asarray(geo.coeff_idx)
    cpad = jnp.concatenate([coeff_scan, jnp.zeros((1, 64), coeff_scan.dtype)])
    rows = cpad[coeff_idx]                              # (n_rows, 64) row gather
    return encode_rows(rows, geo, tabs, use_pallas)
