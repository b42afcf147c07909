"""Device-side greedy activation spacing vs a numpy replica of the
reference rules (activatePointsMT, reference FullSystem.cpp:764-934:
candidate iteration in slot order, dist-map gate `dmap + frac(u) >= need`,
occupancy gate `occ >= need`, 9x9 chevron-min occupancy update)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nalo_slam_tpu.config import Settings
from nalo_slam_tpu.frontend import immature as imm


F, M = 4, 256
H0, W0 = 240, 320
H1, W1 = 120, 160


def _state_with_candidates(rng, n):
    static, trace = imm.empty_device_state(F, M)
    N = F * M
    u = np.zeros(N, np.float32)
    v = np.zeros(N, np.float32)
    my_type = np.ones(N, np.float32)
    valid = np.zeros(N, bool)
    idmin = np.zeros(N, np.float32)
    idmax = np.full(N, np.nan, np.float32)
    status = np.full(N, imm.IPS_UNINITIALIZED, np.int32)
    quality = np.full(N, 10000.0, np.float32)
    # scatter n candidates over hosts 0..F-2 (newest = F-1 is skipped)
    slots = rng.choice((F - 1) * M, n, replace=False)
    u[slots] = rng.uniform(8, W0 - 8, n)
    v[slots] = rng.uniform(8, H0 - 8, n)
    my_type[slots] = rng.choice([1.0, 2.0, 4.0], n)
    valid[slots] = True
    idmin[slots] = 0.1
    idmax[slots] = 0.3
    status[slots] = imm.IPS_GOOD
    static = dict(static, u=jnp.asarray(u), v=jnp.asarray(v),
                  my_type=jnp.asarray(my_type), valid=jnp.asarray(valid))
    trace = dict(trace, idepth_min=jnp.asarray(idmin),
                 idepth_max=jnp.asarray(idmax), status=jnp.asarray(status))
    return static, trace, dict(u=u, v=v, my_type=my_type, valid=valid,
                               idmin=idmin, idmax=idmax)


def _host_greedy(host_data, min_act_dist):
    """Numpy replica of the reference greedy over the same candidates in
    slot order, with an empty distance map (no active points -> dmap=1e4)."""
    u, v = host_data["u"], host_data["v"]
    mty = host_data["my_type"]
    cand = host_data["valid"].copy()
    # level-1 projection used by activation_run's prep (KRKi1 = scale 0.5)
    uu, vv = 0.5 * u, 0.5 * v
    inb = (uu > 0) & (vv > 0) & (uu < W1) & (vv < H1)
    cand &= inb
    occ = np.full((H1, W1), 1e4, np.float32)
    accepted = []
    for k in np.nonzero(cand)[0]:
        need = min_act_dist * mty[k]
        iu = min(int(uu[k]), W1 - 1)
        iv = min(int(vv[k]), H1 - 1)
        d0 = 1e4 + (uu[k] - np.floor(uu[k]))
        if d0 < need or occ[iv, iu] < need:
            continue
        accepted.append(k)
        y0, y1 = max(iv - 4, 0), min(iv + 5, H1)
        x0, x1 = max(iu - 4, 0), min(iu + 5, W1)
        yy, xx = np.mgrid[y0:y1, x0:x1]
        chev = np.maximum(np.abs(yy - iv), np.abs(xx - iu))
        occ[y0:y1, x0:x1] = np.minimum(occ[y0:y1, x0:x1], chev)
    return set(accepted)


@pytest.mark.parametrize("seed,n,dist", [(0, 60, 2.0), (1, 200, 1.0),
                                         (2, 500, 3.5)])
def test_device_greedy_matches_reference_rules(seed, n, dist):
    rng = np.random.default_rng(seed)
    static, trace, host_data = _state_with_candidates(rng, n)
    s = Settings(max_window_frames=F, max_immature_per_frame=M)

    KRKi1 = np.tile(np.diag([0.5, 0.5, 1.0]).astype(np.float32), (F, 1, 1))
    Kt1 = np.zeros((F, 3), np.float32)
    P = 64
    flat, new_valid = imm.activation_run(
        static, trace, jnp.zeros((F, H0, W0, 3), jnp.float32),
        jnp.zeros(P, jnp.float32), jnp.zeros(P, jnp.float32),
        jnp.zeros(P, jnp.float32), jnp.zeros(P, jnp.int32),
        jnp.zeros(P, bool),
        jnp.asarray(KRKi1), jnp.asarray(Kt1),
        jnp.zeros(F, bool), jnp.int32(F - 1),
        s.min_trace_quality, jnp.float32(dist),
        jnp.zeros((F, F, 3, 3), jnp.float32), jnp.zeros((F, F, 3), jnp.float32),
        jnp.zeros((F, F, 2), jnp.float32), jnp.zeros(F, bool),
        jnp.asarray([260.0, 260.0, 159.5, 119.5], jnp.float32), 50.0,
        F=F, M=M, C=1024, A=512, h1=H1, w1=W1, dm_iters=8,
        iters=2, huber_th=9.0, w_img=W0, h_img=H0,
    )
    flat = np.asarray(flat)
    A = 512
    n_acc = int(flat[1])
    slot_a = flat[2 + F * M: 2 + F * M + A].astype(np.int64)[:n_acc]
    got = set(slot_a.tolist())
    want = _host_greedy(host_data, dist)
    assert got == want, (len(got), len(want))
    # consumed valid bits: accepted slots cleared, others untouched
    nv = np.asarray(new_valid)
    assert not nv[sorted(got)].any() if got else True
    untouched = host_data["valid"].copy()
    untouched[sorted(got)] = False
    assert np.array_equal(nv, untouched)
