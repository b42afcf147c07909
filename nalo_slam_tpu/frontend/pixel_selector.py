"""Gradient-based pixel selection.

Host-side vectorized numpy rebuild of PixelSelector
(reference: src/FullSystem/PixelSelector2.cpp, PixelSelector.h).  Selection
runs once per keyframe (not per frame), is irregular, and feeds host-side
point bookkeeping, so it lives on the host; everything is block-reshaped
numpy (no Python pixel loops).

Semantics preserved:
* 32x32-block gradient histograms -> per-block median threshold
  (+setting_minGradHistAdd), 3x3-smoothed and squared (makeHists, :78-141).
* Three-scale selection (select, :564-707): a pot-block picks the pixel with
  the largest |grad . dir| above the level-0 threshold; 2pot-blocks fall
  back to the level-1 gradient map, 4pot-blocks to level-2, each with the
  per-level down-weight dw1/dw2.  Statuses 1/2/4 become the point's
  my_type, which scales the activation distance.
* Density feedback via the potential (makeMaps, :144-291) incl. the random
  sub-sampling below quotia 0.95.
* NALO mask fusion (FusedWithMask, :431-560): mask-histogram median
  quantile; selected pixels are probabilistically promoted/demoted by their
  mask value (see nalo/ for the mask source).

Randomness is a seeded generator (reference uses srand(3141592)); block
directions are drawn per call, which is statistically equivalent to the
reference's running randomPattern index.
"""

from __future__ import annotations

import numpy as np

_DIRECTIONS = np.array(
    [
        [0, 1.0000], [0.3827, 0.9239], [0.1951, 0.9808], [0.9239, 0.3827],
        [0.7071, 0.7071], [0.3827, -0.9239], [0.8315, 0.5556], [0.8315, -0.5556],
        [0.5556, -0.8315], [0.9808, 0.1951], [0.9239, -0.3827], [0.7071, -0.7071],
        [0.5556, 0.8315], [0.9808, -0.1951], [1.0000, 0.0000], [0.1951, -0.9808],
    ],
    dtype=np.float32,
)

_MIN_USE_GRAD_PIXSEL = 10.0


def _block_reduce_argmax(score, passes, p):
    """Per (p x p)-block argmax of score where passes; returns flat index map
    and a (hb, wb) bool of whether the block selected anything."""
    h, w = score.shape
    hb, wb = h // p, w // p
    s = np.where(passes, score, -np.inf)[: hb * p, : wb * p]
    s = s.reshape(hb, p, wb, p).transpose(0, 2, 1, 3).reshape(hb, wb, p * p)
    idx = np.argmax(s, axis=-1)
    best = np.take_along_axis(s, idx[..., None], axis=-1)[..., 0]
    has = np.isfinite(best) & (best > 0)
    dy, dx = idx // p, idx % p
    ys = (np.arange(hb)[:, None] * p + dy)
    xs = (np.arange(wb)[None, :] * p + dx)
    return ys, xs, has


def _pad_to(a, h, w, value):
    ph, pw = h - a.shape[0], w - a.shape[1]
    if ph == 0 and pw == 0:
        return a
    return np.pad(a, ((0, ph), (0, pw)), constant_values=value)


class PixelSelector:
    def __init__(self, w: int, h: int, settings):
        self.w, self.h = w, h
        self.s = settings
        self.current_potential = 3
        self.rng = np.random.default_rng(settings.seed)
        self.ths_smoothed = None
        self._hist_frame_id = None

    # ------------------------------------------------------------------
    def make_hists(self, absgrad0: np.ndarray, frame_id=None):
        """Per-32x32-block smoothed threshold map (reference :78-141)."""
        w, h = self.w, self.h
        w32, h32 = w // 32, h // 32
        g = np.sqrt(absgrad0).astype(np.int32)
        np.clip(g, 0, 48, out=g)
        # exclude 1-px image border like the reference
        valid = np.zeros((h, w), bool)
        valid[1 : h - 1, 1 : w - 1] = True
        gb = g[: h32 * 32, : w32 * 32].reshape(h32, 32, w32, 32).transpose(0, 2, 1, 3)
        vb = valid[: h32 * 32, : w32 * 32].reshape(h32, 32, w32, 32).transpose(0, 2, 1, 3)
        gb = gb.reshape(h32, w32, -1)
        vb = vb.reshape(h32, w32, -1)
        # histogram: count per value 0..48 -> quantile.  One bincount over
        # (block_id * 50 + value) -- np.add.at is ~50x slower here.
        bid = np.broadcast_to(
            (np.arange(h32)[:, None] * w32 + np.arange(w32)[None, :])[..., None],
            gb.shape,
        )
        flat = bid[vb] * 50 + (gb[vb] + 1)
        counts = np.bincount(flat, minlength=h32 * w32 * 50).reshape(
            h32, w32, 50).astype(np.int32)
        n = vb.sum(-1)
        # first i such that cum(count[g<=i]) > 0.5*n - 0.5  (computeHistQuantil)
        cum = np.cumsum(counts[..., 1:], axis=-1)
        th_target = (n * self.s.min_grad_hist_cut + 0.5).astype(np.int64)
        reached = cum > th_target[..., None] - 1
        ths = np.where(reached.any(-1), reached.argmax(-1), 90).astype(np.float32)
        ths += self.s.min_grad_hist_add
        # 3x3 box smooth then square
        pad = np.pad(ths, 1, mode="constant")
        cnt = np.pad(np.ones_like(ths), 1, mode="constant")
        ssum = sum(
            pad[1 + dy : 1 + dy + h32, 1 + dx : 1 + dx + w32]
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        )
        scnt = sum(
            cnt[1 + dy : 1 + dy + h32, 1 + dx : 1 + dx + w32]
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        )
        sm = ssum / scnt
        self.ths_smoothed = (sm * sm).astype(np.float32)
        self._hist_frame_id = frame_id

    # ------------------------------------------------------------------
    def _pixel_thresholds(self):
        """Expand block thresholds to full-res (clamped at remainder)."""
        w, h = self.w, self.h
        w32, h32 = w // 32, h // 32
        bx = np.minimum(np.arange(w) >> 5, w32 - 1)
        by = np.minimum(np.arange(h) >> 5, h32 - 1)
        return self.ths_smoothed[by[:, None], bx[None, :]]

    def select(self, dI0, absgrads, pot: int, th_factor: float):
        """Three-scale selection -> status map (H, W) in {0,1,2,4}."""
        w, h = self.w, self.h
        ag0 = absgrads[0]
        # level-1/2 lookups at the reference's index mapping (:647, :663)
        x = np.arange(w)
        y = np.arange(h)
        x1 = np.clip((x * 0.5 + 0.25).astype(np.int32), 0, absgrads[1].shape[1] - 1)
        y1 = np.clip((y * 0.5 + 0.25).astype(np.int32), 0, absgrads[1].shape[0] - 1)
        ag1 = absgrads[1][y1[:, None], x1[None, :]]
        x2 = np.clip((x * 0.25 + 0.125).astype(np.int32), 0, absgrads[2].shape[1] - 1)
        y2 = np.clip((y * 0.25 + 0.125).astype(np.int32), 0, absgrads[2].shape[0] - 1)
        ag2 = absgrads[2][y2[:, None], x2[None, :]]

        th0 = self._pixel_thresholds() * th_factor
        dw1 = self.s.grad_downweight_per_level
        th1 = th0 * dw1
        th2 = th1 * dw1 * dw1

        # border exclusion (reference :612)
        border = np.zeros((h, w), bool)
        border[4 : h - 4, 4 : w - 5] = True
        # (x >= w-5 excluded; y > h-4 excluded)

        passes0 = border & (ag0 > th0)
        passes1 = border & (ag1 > th1)
        passes2 = border & (ag2 > th2)

        gx, gy = dI0[..., 1], dI0[..., 2]

        p1, p2, p4 = pot, 2 * pot, 4 * pot
        hp = ((h + p4 - 1) // p4) * p4
        wp = ((w + p4 - 1) // p4) * p4

        def padded(a, fill):
            return _pad_to(a, hp, wp, fill)

        gxp, gyp = padded(gx, 0.0), padded(gy, 0.0)
        pass0p, pass1p, pass2p = (padded(p, False) for p in (passes0, passes1, passes2))

        status = np.zeros((hp, wp), np.float32)

        def dir_scores(p):
            nb_h, nb_w = hp // p, wp // p
            didx = self.rng.integers(0, 16, size=(nb_h, nb_w))
            d = _DIRECTIONS[didx]  # (nb_h, nb_w, 2)
            dfull = np.repeat(np.repeat(d, p, axis=0), p, axis=1)
            return np.abs(gxp * dfull[..., 0] + gyp * dfull[..., 1])

        if self.s.select_direction_distribution:
            sc1, sc2, sc4 = dir_scores(p1), dir_scores(p2), dir_scores(p4)
        else:
            sc1, sc2, sc4 = (padded(a, 0.0) for a in (ag0, ag1, ag2))

        # scale 1: per pot-block argmax over passes0
        ys, xs, has1 = _block_reduce_argmax(sc1, pass0p, p1)
        status[ys[has1], xs[has1]] = 1.0

        # scale 2: 2pot-blocks with NO passes0 pixel
        b0 = pass0p.reshape(hp // p2, p2, wp // p2, p2).any((1, 3))
        ys, xs, has2 = _block_reduce_argmax(sc2, pass1p, p2)
        has2 = has2 & ~b0
        status[ys[has2], xs[has2]] = 2.0

        # scale 4: 4pot-blocks with neither passes0 nor passes1
        b01 = (pass0p | pass1p).reshape(hp // p4, p4, wp // p4, p4).any((1, 3))
        ys, xs, has4 = _block_reduce_argmax(sc4, pass2p, p4)
        has4 = has4 & ~b01
        status[ys[has4], xs[has4]] = 4.0

        status = status[:h, :w]
        counts = (
            int((status == 1).sum()),
            int((status == 2).sum()),
            int((status == 4).sum()),
        )
        return status, counts

    # ------------------------------------------------------------------
    def make_maps(self, dI0, absgrads, density: float, recursions_left: int = 1,
                  th_factor: float = 2.0, frame_id=None):
        """Density-adaptive selection (reference makeMaps :144-291)."""
        if self._hist_frame_id is None or frame_id is None or frame_id != self._hist_frame_id:
            self.make_hists(absgrads[0], frame_id)

        status, counts = self.select(dI0, absgrads, self.current_potential, th_factor)
        num_have = float(sum(counts))
        quotia = density / max(num_have, 1.0)

        K = num_have * (self.current_potential + 1) ** 2
        ideal = int(np.sqrt(K / max(density, 1.0)) - 1)
        ideal = max(ideal, 1)

        if recursions_left > 0 and quotia > 1.25 and self.current_potential > 1:
            if ideal >= self.current_potential:
                ideal = self.current_potential - 1
            self.current_potential = ideal
            return self.make_maps(dI0, absgrads, density, recursions_left - 1, th_factor, frame_id)
        if recursions_left > 0 and quotia < 0.25:
            if ideal <= self.current_potential:
                ideal = self.current_potential + 1
            self.current_potential = ideal
            return self.make_maps(dI0, absgrads, density, recursions_left - 1, th_factor, frame_id)

        if quotia < 0.95:
            keep = self.rng.random(status.shape) <= quotia
            status = np.where((status != 0) & ~keep, 0.0, status)
        self.current_potential = ideal
        return status

    # ------------------------------------------------------------------
    def fuse_with_mask(self, status: np.ndarray, mask: np.ndarray):
        """NALO mask fusion (reference FusedWithMask :431-560).

        mask: (H, W) float in [0, 255] -- the MP-mask prior image.  Pixels
        with high mask value (strong LiDAR geometry prior) are promoted,
        low-value ones demoted, with the reference's probabilities.
        """
        nz = mask[mask != 0]
        if nz.size == 0:
            return status
        hist, _ = np.histogram(nz.astype(np.int32), bins=256, range=(0, 256))
        cum = np.cumsum(hist)
        target = nz.size * 0.5 + 0.5
        quantile = int(np.searchsorted(cum, target))
        nonzero_bins = np.nonzero(hist)[0]
        max_mas = int(nonzero_bins[-1]) if nonzero_bins.size else 0

        r = self.rng.random(status.shape)
        out = status.copy()
        # demote 1 -> 2 where mask is weak (prob 0.5)
        demote = (status == 1) & (r > 0.5) & (mask < quantile / 3.0)
        out[demote] = 2.0
        # promote 2 -> 1 where mask is strong (prob 0.6)
        promote = (status == 2) & (r < 0.6) & (mask > quantile + (max_mas - quantile) / 2.0)
        out[promote] = 1.0
        # seed new points on strong mask (prob 0.01)
        seed = (status == 0) & (r < 0.01) & (mask > quantile)
        out[seed] = 1.0
        return out


# ---------------------------------------------------------------------------
# Pyramid-level grid selector for the initializer (PixelSelector.h:199-256)
# ---------------------------------------------------------------------------


def make_pixel_status(dI, desired_density: float, recs_left: int = 5,
                      th_fac: float = 1.0, sparsity: int = 5):
    """Grid-max selection on a pyramid level; returns (bool map, count).

    Per pot-block, marks up to 4 pixels maximizing |gx|, |gy|, |gx-gy|,
    |gx+gy| among those above the gradient floor, then adapts the grid pitch
    to the desired density (reference makePixelStatus).
    """
    h, w = dI.shape[:2]
    gx, gy = dI[..., 1], dI[..., 2]
    sq = gx * gx + gy * gy
    th = th_fac * _MIN_USE_GRAD_PIXSEL * 0.75

    def run(pot):
        passes = sq > th * th
        passes[:1, :] = False
        passes[:, :1] = False
        out = np.zeros((h, w), bool)
        hp = ((h + pot - 1) // pot) * pot
        wp = ((w + pot - 1) // pot) * pot
        pp = _pad_to(passes, hp, wp, False)
        for score in (np.abs(gx), np.abs(gy), np.abs(gx - gy), np.abs(gx + gy)):
            sp = _pad_to(score, hp, wp, 0.0)
            ys, xs, has = _block_reduce_argmax(sp, pp, pot)
            out[np.clip(ys[has], 0, h - 1), np.clip(xs[has], 0, w - 1)] = True
        return out

    pot = max(sparsity, 1)
    for _ in range(recs_left + 1):
        sel = run(pot)
        n = int(sel.sum())
        quotia = n / max(desired_density, 1.0)
        new_pot = int(pot * np.sqrt(quotia) + 0.7)
        new_pot = max(new_pot, 1)
        if abs(new_pot - pot) < 1 or (quotia > 0.8 and 1.0 / max(quotia, 1e-9) > 0.8):
            return sel, n
        pot = new_pot
    return sel, n
