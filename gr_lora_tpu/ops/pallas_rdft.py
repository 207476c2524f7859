"""Real-DFT-decomposed direct pyramid front-end (round 5): half the MXU
work of ops/pallas_direct at the same output contract.

The direct kernel spends its MXU time computing FOUR complex zoom-DFT
band spectra per hop — {unwindowed, Kaiser-windowed} x {bins [0, K),
bins [F-K, F)} — as one packed real matmul with 8 real columns per bin
(pallas_direct._weights).  But the two BANDS are not independent: with
the dechirp multiply moved out of the weights and into a VPU prologue,
the transform is a plain DFT of the dechirped frame u, and splitting
u = ur + i*ui into its real and imaginary parts gives

    X(b)  = R(b) + i*I(b),        R = DFT(ur), I = DFT(ui)
    X(-b) = conj(R(b)) + i*conj(I(b))        (ur, ui real)

so the negative band |X(b - K)| = |X(-(K - b))| falls out of the SAME
positive-band dot outputs by a conjugate recombination — no second band
dot.  Per frame the MXU work drops from 32*n*K real MACs to 16*n*(K+pad)
(four real dots [ft, n] @ [n, 2*(K+128)]: {ur, ui, ur*win, ui*win}
against one shared cos|sin weight block), and the weight block shrinks
8x, small enough to keep the ENTIRE bin axis resident in VMEM — the
frame tiles stream through HBM exactly once instead of once per bin
tile.

The price is a richer VPU epilogue: the conjugate recombination (four
adds), and the fold pairing |X(j)| + |X(-(K-j))| needs the mirror
magnitudes lane-REVERSED.  Reversal is a static permutation; ``rev=``
selects jnp.flip (Mosaic lane shuffle) or a per-128-block anti-identity
matmul fallback (exact: each output lane sums one product).

Numerics: identical bf16-dot / f32-accumulate class as pallas_direct —
raw samples stay f32 through frame assembly (in VMEM since r5,
_split_hops/_assemble: HBM reads each sample once and the old
frame-materializing XLA prologue is gone) and the dechirp product and
window are applied in f32 and rounded to bf16 once, where the direct
kernel rounds the chirp-times-exponential weight once.  Reference hot
loop: pyramid_demod_impl.cc:569-603; fold landmine notes:
ops/dechirp.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import PYRAMID_OVERLAP_FACTOR, LoraConfig
from .chirp import chirp_tables
from .dechirp import kaiser_window

_R = PYRAMID_OVERLAP_FACTOR
_LANE = 128


def _rdft_weights(cfg: LoraConfig) -> jnp.ndarray:
    """bf16 [n, 2*kp]: pure zoom-DFT exponentials for bins 0..K inclusive
    (columns K+1..kp-1 zero), [cos | -sin] so that u @ W yields
    [Re DFT(u) | Im DFT(u)] for real u."""
    n = cfg.num_samples
    f = cfg.fft_size
    k = cfg.bin_size
    kp = k + _LANE
    th = 2.0 * np.pi * np.outer(np.arange(n), np.arange(kp)) / f
    w = np.zeros((n, 2 * kp), np.float32)
    w[:, :kp] = np.cos(th)
    w[:, kp:] = -np.sin(th)
    w[:, k + 1:kp] = 0.0
    w[:, kp + k + 1:] = 0.0
    return jnp.asarray(w).astype(jnp.bfloat16)


def _consts(cfg: LoraConfig) -> jnp.ndarray:
    """f32 [8, n]: row 0/1 = downchirp re/im (the dechirp multiplier),
    row 2 = Kaiser window; rows padded to a full sublane group."""
    n = cfg.num_samples
    _, down = chirp_tables(cfg.sf, cfg.p)
    c = np.zeros((8, n), np.float32)
    c[0] = down.real.astype(np.float32)
    c[1] = down.imag.astype(np.float32)
    c[2] = kaiser_window(n, cfg.beta).astype(np.float32)
    return jnp.asarray(c)


def _reverse(x, k, rev):
    """[ft, K] -> lane-reversed [ft, K].

    'matmul' (default — lax.rev has no Mosaic TC lowering as of jax
    0.9.0): per-128-block anti-identity matmul + static block reorder.
    The permutation is exact (every output lane sums ONE product) and
    runs at the 1-pass bf16 MXU rate, so the only numeric effect is one
    bf16 rounding of the mirror magnitudes (~0.4 % — far inside the
    bf16 front-end's existing error class); cost ~3 % of the main dots.
    'flip' (jnp.flip) is kept for interpret mode / future Mosaic
    support.  'none' skips the permutation (WRONG fold — diagnostic
    only, for isolating the reversal's cost in tools/kernel_ab.py)."""
    if rev == "none":
        return x
    if rev == "flip":
        return jnp.flip(x, axis=-1)
    ri = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
    p = (ri + ci == _LANE - 1).astype(jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    blocks = [jnp.dot(xb[:, k - (t + 1) * _LANE:k - t * _LANE], p,
                      preferred_element_type=jnp.float32)
              for t in range(k // _LANE)]
    return jnp.concatenate(blocks, axis=-1)


def _split_hops(iq, fpad, hop):
    """iq f32[T, 2] -> hop rows f32[fpad + 8, 2*hop]: row j = [re | im]
    of hop-chunk j (zero-padded past T).  One cheap relayout pass — the
    kernel reads these rows once and assembles overlapped frames in
    VMEM (_assemble)."""
    need = (fpad + _R) * hop
    pad = max(need - iq.shape[0], 0)
    x = jnp.pad(iq, ((0, pad), (0, 0)))[:need]
    xs = x.reshape(fpad + _R, hop, 2)
    return jnp.concatenate([xs[..., 0], xs[..., 1]], axis=-1)


def _hop_specs(ft, hop):
    """BlockSpecs over the _split_hops layout: the main [ft, 2*hop]
    tile plus an [8, 2*hop] halo (the next 8 hop rows) — two views of
    the SAME array, since BlockSpec offsets are block-granular and an
    overlapping [ft + 8] window has no block-unit stride."""
    assert ft % _R == 0
    return (pl.BlockSpec((ft, 2 * hop), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_R, 2 * hop), lambda i: ((i + 1) * ft // _R, 0),
                         memory_space=pltpu.VMEM))


def _assemble(m_ref, h_ref, xr_scr, xi_scr, *, ft, hop, n):
    """Overlapped-frame assembly IN VMEM (r5): main block [ft, 2*hop]
    f32 (hop-chunk rows, [re | im] lanes) + halo block [8, 2*hop] (the
    next 8 hop rows) -> (xr, xi) [ft, n] f32 frame tiles in scratch.
    Row-shifted static slices stored at static lane offsets replace the
    old XLA frame-assembly prologue, whose serial HBM pass (f32 gather
    per element + bf16 write, ~117 MB at 16k frames) was the largest
    non-roofline term in the measured wall (bench.rdft_cost r5); HBM now
    reads each input sample once, and the raw samples stay f32 until the
    dechirp product's single bf16 rounding (one rounding, not two).
    Scratch stores, not jnp.concatenate: Mosaic's concat rejects
    operands whose sublane/lane vpad offsets differ off the concat dim
    ('result/input offset mismatch'), while its store path relayouts
    each shifted slice."""
    r_ = n // hop
    m = m_ref[:, :]
    h = h_ref[:, :]
    for r in range(r_):
        lo, hi = r * hop, (r + 1) * hop
        if r == 0:
            xr_scr[:, lo:hi] = m[:, :hop]
            xi_scr[:, lo:hi] = m[:, hop:]
        else:
            xr_scr[:ft - r, lo:hi] = m[r:, :hop]
            xi_scr[:ft - r, lo:hi] = m[r:, hop:]
            xr_scr[ft - r:, lo:hi] = h[:r, :hop]
            xi_scr[ft - r:, lo:hi] = h[:r, hop:]
    return xr_scr[...], xi_scr[...]


def _components(xr, xi, w_ref, c_ref, *, n, kp, fuse):
    """Shared dot stage: f32 frame tile components -> the four [ft, 2kp]
    f32 DFT component pairs (R, I for the plain and windowed dechirped
    frame).

    ``fuse``: stack the four real input rows into ONE [4*ft, n] dot
    (they share the weight block) — a 4x taller MXU shape that pays off
    when 2kp is narrow (the ff=2 zoom); needs 4x the accumulator VMEM."""
    dr = c_ref[0:1, :]
    di = c_ref[1:2, :]
    win = c_ref[2:3, :]
    # Dechirp in f32, one bf16 rounding per operand (module doc).
    ur = xr * dr - xi * di
    ui = xr * di + xi * dr
    comps = (ur, ui, ur * win, ui * win)
    if fuse:
        ft = xr.shape[0]
        u4 = jnp.concatenate([c.astype(jnp.bfloat16) for c in comps],
                             axis=0)
        y = jnp.dot(u4, w_ref[:], preferred_element_type=jnp.float32)
        return tuple(y[i * ft:(i + 1) * ft] for i in range(4))
    return tuple(jnp.dot(c.astype(jnp.bfloat16), w_ref[:],
                         preferred_element_type=jnp.float32)
                 for c in comps)


def _recombine(y1, y2, *, k, kp, rev):
    """(R, I) component pair -> (m_pos[ft,K], m_neg_rev[ft,K])."""
    rre, rim = y1[:, :kp], y1[:, kp:]
    ire, iim = y2[:, :kp], y2[:, kp:]
    xre = rre[:, :k] - iim[:, :k]
    xim = rim[:, :k] + ire[:, :k]
    mpos = jnp.sqrt(xre * xre + xim * xim)             # |X(b)|, b in [0,K)
    gre = rre[:, 1:k + 1] + iim[:, 1:k + 1]
    gim = ire[:, 1:k + 1] - rim[:, 1:k + 1]
    g = jnp.sqrt(gre * gre + gim * gim)                # |X(-b)|, b in [1,K]
    return mpos, _reverse(g, k, rev)                   # g_rev[j] = |X(j-K)|


def _kernel(m_ref, h_ref, w_ref, c_ref, fa_ref, faw_ref, hs_ref, xr_scr,
            xi_scr, *, ft, hop, n, k, kp, rev, fuse):
    xr, xi = _assemble(m_ref, h_ref, xr_scr, xi_scr, ft=ft, hop=hop, n=n)
    yu1, yu2, yw1, yw2 = _components(xr, xi, w_ref, c_ref, n=n, kp=kp,
                                     fuse=fuse)
    m0, m1 = _recombine(yu1, yu2, k=k, kp=kp, rev=rev)
    fa_ref[:, :] = m0 + m1
    hs_ref[:, :] = jnp.maximum(m0, m1)
    m2, m3 = _recombine(yw1, yw2, k=k, kp=kp, rev=rev)
    faw_ref[:, :] = m2 + m3


@lru_cache(maxsize=None)
def make_rdft_spectra(cfg: LoraConfig, num_frames: int,
                      frame_tile: int = 0, rev: str = "matmul",
                      fuse: bool | None = None,
                      interpret: bool = False):
    """Jitted iq float32[T, 2] -> (fft_add, fft_add_w, h_single), each
    [num_frames, K] — drop-in for ops/pallas_direct.make_direct_spectra
    at half the MXU FLOPs and one HBM pass over the frames."""
    n = cfg.num_samples
    k = cfg.bin_size
    kp = k + _LANE
    hop = n // _R
    if fuse is None:
        # Stacked four-row dot pays off when the weight block is narrow
        # (ff<=2 zooms); at wide 2kp its 4x accumulator VMEM hurts.
        fuse = k <= 1024
    if frame_tile <= 0:
        # A/B r5 (tools/kernel_ab.py): ff=8 nofuse ft256 438 vs ft128
        # 398 Msps; ff=2 fuse ft128 1277 vs ft256 1238 Msps (the fused
        # dot is already 4*ft rows tall).
        frame_tile = 128 if fuse else 256
    # Rounded UP to a multiple of _R: the halo BlockSpec indexes in
    # 8-row units (_hop_specs), and short plans (num_frames < frame_tile
    # and not a multiple of 8 — small pyramid_demodulate buffers) must
    # still build; the padding rows are zero-fed and sliced off.
    ft = -(-min(frame_tile, max(8, num_frames)) // _R) * _R
    nft = -(-num_frames // ft)
    fpad = nft * ft
    w_all = _rdft_weights(cfg)
    c_all = _consts(cfg)

    grid = (nft,)
    m_spec, h_spec = _hop_specs(ft, hop)
    w_spec = pl.BlockSpec((n, 2 * kp), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((8, n), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ft, k), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        partial(_kernel, ft=ft, hop=hop, n=n, k=k, kp=kp, rev=rev,
                fuse=fuse),
        grid=grid,
        in_specs=[m_spec, h_spec, w_spec, c_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((fpad, k), jnp.float32)
                        for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((ft, n), jnp.float32),
                        pltpu.VMEM((ft, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def run(iq):
        xs = _split_hops(iq, fpad, hop)
        fa, faw, hs = call(xs, xs, w_all, c_all)
        return fa[:num_frames], faw[:num_frames], hs[:num_frames]

    return jax.jit(run)


# ---------------------------------------------------------------------------
# Fused peak search on the rDFT spectra: the dense arrays never leave VMEM.
# ---------------------------------------------------------------------------

def rdft_peaks_supported(cfg: LoraConfig) -> bool:
    """The single-tile rDFT plan needs the [n, 2*(K+128)] bf16 weight
    block (4*n*kp bytes) plus the four [ft, 2*kp] f32 accumulators, the
    [ft, n] assembly scratches and the [ft, K] top-M workspace resident
    in VMEM at once.  Cap raised r5 to admit the SF9 collision zoom —
    n*kp = 4,325,376, ~45 MB at ft=128, the largest admitted point,
    measured compiling and running on the v5e (tools/kernel_ab.py
    --sf 9: 230 Msps) — and set just above it so no UNvalidated larger
    shape (e.g. SF10 x ff=2 at 4.46 M) slips in; SF10 x ff=8's 67 MB
    weight block alone does not leave room."""
    return cfg.num_samples * (cfg.bin_size + _LANE) <= 4_350_000


def _peaks_kernel(m_ref, hal_ref, w_ref, c_ref, val_ref, bin_ref, h_ref,
                  hs_ref, ws, xr_scr, xi_scr, *, ft, hop, n, k, kp, kt,
                  max_peaks, threshold, rev, fuse):
    """Full-K spectra in VMEM (same math as _kernel), then the pyramid
    peak epilogue — strict cyclic local max + threshold + top-M — per
    kt-bin block while everything is live; only [nkt, ft, M] candidates
    reach HBM.  Mirrors ops/pallas_direct._peaks_kernel (reference
    epilogue: pyramid_demod_impl.cc:225-272) on half the MXU work."""
    xr, xi = _assemble(m_ref, hal_ref, xr_scr, xi_scr, ft=ft, hop=hop,
                       n=n)
    yu1, yu2, yw1, yw2 = _components(xr, xi, w_ref, c_ref, n=n, kp=kp,
                                     fuse=fuse)
    m0, m1 = _recombine(yu1, yu2, k=k, kp=kp, rev=rev)
    fa = m0 + m1
    hs = jnp.maximum(m0, m1)
    m2, m3 = _recombine(yw1, yw2, k=k, kp=kp, rev=rev)
    faw = m2 + m3                                        # [ft, K]

    # Cyclic neighbors via a (K+2)-wide pad (find_and_add_peak :229-235).
    fawp = jnp.concatenate([faw[:, k - 1:k], faw, faw[:, 0:1]], axis=-1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (ft, kt), 1)
    for j in range(k // kt):
        c0 = j * kt
        ctr = faw[:, c0:c0 + kt]
        is_peak = ((ctr > threshold)
                   & (ctr > fawp[:, c0:c0 + kt])
                   & (ctr > fawp[:, c0 + 2:c0 + kt + 2]))
        val_ref[j] = jnp.full((ft, max_peaks), -jnp.inf, jnp.float32)
        bin_ref[j] = jnp.zeros((ft, max_peaks), jnp.int32)
        h_ref[j] = jnp.zeros((ft, max_peaks), jnp.float32)
        hs_ref[j] = jnp.zeros((ft, max_peaks), jnp.float32)
        cnt = jnp.max(jnp.sum(is_peak.astype(jnp.int32), axis=-1))
        ws[...] = jnp.where(is_peak, ctr, -jnp.inf)
        fa_j = fa[:, c0:c0 + kt]
        hs_j = hs[:, c0:c0 + kt]
        # The top-M loop iterates only while peaks remain (quiet blocks —
        # the overwhelming majority at the collision threshold — skip the
        # cross-lane reductions entirely).
        for m in range(max_peaks):
            @pl.when(m < cnt)
            def _(m=m, j=j, fa_j=fa_j, hs_j=hs_j):
                work = ws[...]
                v = jnp.max(work, axis=-1)
                a = jnp.argmax(work, axis=-1).astype(jnp.int32)
                sel = lanes == a[:, None]
                val_ref[j, :, m] = v
                bin_ref[j, :, m] = c0 + a
                h_ref[j, :, m] = jnp.sum(jnp.where(sel, fa_j, 0.0), axis=-1)
                hs_ref[j, :, m] = jnp.sum(jnp.where(sel, hs_j, 0.0), axis=-1)
                if m + 1 < max_peaks:
                    ws[...] = jnp.where(sel, -jnp.inf, work)


@lru_cache(maxsize=None)
def make_rdft_peaks(cfg: LoraConfig, num_frames: int, max_peaks: int = 8,
                    frame_tile: int = 0, k_tile: int = 0,
                    rev: str = "matmul", fuse: bool | None = None,
                    interpret: bool = False):
    """Jitted iq float32[T, 2] -> per-hop top-M pyramid peaks
    (bins int32[H, M], h f32[H, M], h_single f32[H, M], valid bool[H, M])
    — the models/pyramid.peak_lattice_fn contract with BOTH the rDFT
    recombination (half the MXU work of ops/pallas_direct.
    make_direct_peaks) and the in-VMEM peak search; HBM reads each raw
    f32 sample once (hop rows + halo, _split_hops/_assemble) and sees
    only ~nkt*M*16 B/hop of candidates out."""
    n = cfg.num_samples
    k = cfg.bin_size
    kp = k + _LANE
    hop = n // _R
    # Default: the whole bin axis as ONE top-M block.  The cross-lane
    # reduction work is identical to 128-bin blocks (same total
    # elements), but the scalar-guarded @pl.when branches per frame tile
    # drop 16x — the per-block branch machinery, not the selection
    # arithmetic, dominated the blocked variant (same wall on peak-free
    # and peak-dense fixtures) — and the cross-block XLA top-k
    # disappears.  A/B r5 (tools/kernel_ab.py, ff=8): full-K 339 Msps vs
    # kt=512 110 / kt=128 109; ff=2: 645 vs 630.
    kt = k if k_tile <= 0 else min(k_tile, k)
    assert k % kt == 0
    if frame_tile <= 0:
        frame_tile = 256        # A/B r5: 108 vs 101 Msps over ft=128
    if fuse is None:
        fuse = k <= 1024
    # Rounded UP to a multiple of _R — see make_rdft_spectra.
    ft = -(-min(frame_tile, max(8, num_frames)) // _R) * _R
    nft = -(-num_frames // ft)
    fpad = nft * ft
    nkt = k // kt
    w_all = _rdft_weights(cfg)
    c_all = _consts(cfg)
    threshold = float(cfg.threshold)

    grid = (nft,)
    m_spec, h_spec = _hop_specs(ft, hop)
    w_spec = pl.BlockSpec((n, 2 * kp), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((8, n), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    cand_spec = pl.BlockSpec((nkt, ft, max_peaks), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        partial(_peaks_kernel, ft=ft, hop=hop, n=n, k=k, kp=kp, kt=kt,
                max_peaks=max_peaks, threshold=threshold, rev=rev,
                fuse=fuse),
        grid=grid,
        in_specs=[m_spec, h_spec, w_spec, c_spec],
        out_specs=(cand_spec,) * 4,
        out_shape=(
            jax.ShapeDtypeStruct((nkt, fpad, max_peaks), jnp.float32),
            jax.ShapeDtypeStruct((nkt, fpad, max_peaks), jnp.int32),
            jax.ShapeDtypeStruct((nkt, fpad, max_peaks), jnp.float32),
            jax.ShapeDtypeStruct((nkt, fpad, max_peaks), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((ft, kt), jnp.float32),
                        pltpu.VMEM((ft, n), jnp.float32),
                        pltpu.VMEM((ft, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def run(iq):
        xs = _split_hops(iq, fpad, hop)
        outs = call(xs, xs, w_all, c_all)
        vals, bins, h, hs = (
            jnp.moveaxis(o, 0, 1).reshape(fpad, nkt * max_peaks)
            for o in outs)
        if nkt > 1:
            top_vals, sel = jax.lax.top_k(vals, max_peaks)
            tk = partial(jnp.take_along_axis, indices=sel, axis=-1)
            bins, h, hs = tk(bins), tk(h), tk(hs)
        else:
            top_vals = vals
        valid = jnp.isfinite(top_vals)
        return (bins[:num_frames].astype(jnp.int32), h[:num_frames],
                hs[:num_frames], valid[:num_frames])

    return run
