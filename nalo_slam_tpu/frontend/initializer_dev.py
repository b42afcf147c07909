"""Device-resident kernels for the monocular initializer.

The per-level LM loop of CoarseInitializer::trackFrame (reference
src/FullSystem/CoarseInitializer.cpp:81-285) runs as one jitted
lax.while_loop per pyramid level; the neighbor-median regularization
(optReg :656-692), reset (:902-931), inter-level propagation (:695-765)
and the idepth step (:906-957) are all jnp.  The host only sequences
levels and pulls the final pose -- on link-limited hardware this turns
~50 round trips per initializer frame into ~10 async calls.

The math is identical to initializer.py's host reference implementation
(kept for documentation); parity is enforced by tests/test_initializer.py
running the whole bootstrap through this path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import lie
from .initializer import (_ALPHA_K, _ALPHA_W, _COUPLING_WEIGHT, _REG_WEIGHT,
                          _calc_res_gs)

_MAX_ITERATIONS = (5, 5, 10, 30, 50, 50)


@jax.jit
def opt_reg(state, snapped):
    """iR <- 0.2*idepth + 0.8*median(good-neighbor iR) (reference optReg)."""
    def not_snapped(state):
        return dict(state, iR=jnp.ones_like(state["iR"]))

    def do(state):
        nb = state["neighbours"]                    # (P, 10)
        nb_c = jnp.clip(nb, 0, None)
        nb_ok = (nb >= 0) & state["is_good"][nb_c]
        nb_iR = jnp.where(nb_ok, state["iR"][nb_c], jnp.inf)
        nnn = jnp.sum(nb_ok, axis=1)
        srt = jnp.sort(nb_iR, axis=1)
        med = jnp.take_along_axis(
            srt, jnp.minimum(nnn // 2, 9)[:, None], axis=1
        )[:, 0]
        upd = state["is_good"] & (nnn > 2)
        iR = jnp.where(
            upd, (1 - _REG_WEIGHT) * state["idepth"] + _REG_WEIGHT * med,
            state["iR"],
        )
        return dict(state, iR=iR)

    return jax.lax.cond(snapped, do, not_snapped, state)


@partial(jax.jit, static_argnames=("top_level",))
def reset_points(state, top_level: bool):
    state = dict(state, energy=jnp.zeros_like(state["energy"]),
                 idepth_new=state["idepth"])
    if top_level:
        nb = state["neighbours"]
        nb_c = jnp.clip(nb, 0, None)
        nb_ok = (nb >= 0) & state["is_good"][nb_c]
        nb_iR = jnp.where(nb_ok, state["iR"][nb_c], 0.0)
        sn = jnp.sum(nb_ok, axis=1)
        val = jnp.sum(nb_iR, axis=1) / jnp.maximum(sn, 1)
        fix = ~state["is_good"] & (sn > 0) & state["valid"]
        state = dict(
            state,
            is_good=state["is_good"] | fix,
            iR=jnp.where(fix, val, state["iR"]),
            idepth=jnp.where(fix, val, state["idepth"]),
            idepth_new=jnp.where(fix, val, state["idepth_new"]),
        )
    return state


@jax.jit
def propagate_down(src, dst):
    """Initialize a finer level from its parents (reference :735-765)."""
    par = jnp.clip(dst["parent"], 0, None)
    p_good = src["is_good"][par] & (src["last_hessian"][par] >= 0.1) & (dst["parent"] >= 0)
    p_iR = src["iR"][par]
    child_bad = ~dst["is_good"]
    adopt = p_good & child_bad & dst["valid"]
    blend = p_good & ~child_bad & dst["valid"]
    wch = dst["last_hessian"] * 2
    wpa = src["last_hessian"][par]
    newiR = (dst["iR"] * wch + p_iR * wpa) / jnp.maximum(wch + wpa, 1e-12)

    def mix(cur):
        return jnp.where(adopt, p_iR, jnp.where(blend, newiR, cur))

    return dict(
        dst,
        iR=mix(dst["iR"]), idepth=mix(dst["idepth"]), idepth_new=mix(dst["idepth_new"]),
        is_good=dst["is_good"] | adopt,
        last_hessian=jnp.where(adopt, 0.0, dst["last_hessian"]),
    )


@jax.jit
def propagate_up(src, dst):
    """Pool idepths into the coarser level (reference :695-733)."""
    nd = dst["u"].shape[0]
    par = jnp.clip(src["parent"], 0, None)
    good = src["is_good"] & (src["parent"] >= 0) & src["valid"]
    w = jnp.where(good, src["last_hessian"], 0.0)
    iR_sum = jnp.zeros(nd).at[par].add(w * src["iR"])
    w_sum = jnp.zeros(nd).at[par].add(w)
    upd = w_sum > 0
    val = iR_sum / jnp.maximum(w_sum, 1e-12)
    return dict(
        dst,
        iR=jnp.where(upd, val, dst["iR"]),
        idepth=jnp.where(upd, val, dst["idepth"]),
        is_good=dst["is_good"] | upd,
    )


def make_level_lm(lvl: int, K, ref_dI, huber_th: float, fix_affine: bool):
    """One jitted LM descent for a level (reference trackFrame :134-258)."""
    max_it = _MAX_ITERATIONS[min(lvl, len(_MAX_ITERATIONS) - 1)]
    Kj = jnp.asarray(K, jnp.float32)

    def ev(new_dI, state, R, t, aff, snapped, quads=None):
        nq, rq = quads if quads is not None else (None, None)
        return _calc_res_gs(
            ref_dI, new_dI,
            state["u"], state["v"], state["idepth_new"], state["is_good"],
            state["energy"], state["iR"], state["outlier_th"], state["valid"],
            R, t, jnp.stack([jnp.exp(aff[0]), aff[1]]), Kj, snapped,
            huber_th=huber_th, new_quad=nq, ref_quad0=rq,
        )

    def apply_step(state, r):
        good = r["is_good_new"] & state["valid"]
        return dict(
            state,
            energy=jnp.stack(
                [jnp.where(good, r["energy_new"], state["energy"][:, 0]),
                 jnp.where(good, r["e_reg_new"], state["energy"][:, 1])], axis=1),
            is_good=good,
            idepth=jnp.where(good, state["idepth_new"], state["iR"]),
            idepth_new=jnp.where(good, state["idepth_new"], state["iR"]),
            last_hessian=jnp.where(good, r["last_hessian_new"], state["last_hessian"]),
            maxstep=r["maxstep"],
            Jb=r["Jb_new"],
        )

    def do_step(state, inc, lam):
        Jb = state["Jb"]
        b = Jb[:, 8] + Jb[:, :8] @ inc
        step = -b * Jb[:, 9] / (1 + lam)
        ms = jnp.minimum(0.25 * state["maxstep"], 1e10)
        step = jnp.clip(step, -ms, ms)
        newid = jnp.clip(state["idepth"] + step, 1e-3, 50.0)
        return dict(state, idepth_new=jnp.where(state["is_good"], newid, state["idepth_new"]))

    def calc_ec(state, snapped):
        g = state["is_good"] & state["valid"]
        r_old = jnp.where(g, state["idepth"] - state["iR"], 0.0)
        r_new = jnp.where(g, state["idepth_new"] - state["iR"], 0.0)
        e_old = _COUPLING_WEIGHT * jnp.sum(r_old**2)
        e_new = _COUPLING_WEIGHT * jnp.sum(r_new**2)
        return jnp.where(snapped, e_old, 0.0), jnp.where(snapped, e_new, 0.0)

    def solve(r, R, t, lam):
        da = r["diag_add"]
        H = r["H"].astype(jnp.float32)
        H = H.at[0, 0].add(da).at[1, 1].add(da).at[2, 2].add(da)
        b = r["b"].astype(jnp.float32)
        tlog = lie.se3_log(R, t)[:3]
        b = b.at[0:3].add(tlog * da)
        # alpha prior first, then LM damping (reference :604-611, :160)
        H = H + jnp.diag(jnp.diag(H)) * lam
        Hl = H - r["Hsc"] * (1.0 / (1 + lam))
        bl = b - r["bsc"] * (1.0 / (1 + lam))
        d = jnp.sqrt(jnp.abs(jnp.diag(Hl)) + 1e-10)
        di = 1.0 / d
        if fix_affine:
            x6 = jnp.linalg.solve(
                (Hl * di[:, None] * di[None, :])[:6, :6]
                + 1e-12 * jnp.eye(6), (bl * di)[:6])
            inc = jnp.concatenate([-(x6 * di[:6]), jnp.zeros(2)])
        else:
            x = jnp.linalg.solve(
                Hl * di[:, None] * di[None, :] + 1e-12 * jnp.eye(8), bl * di)
            inc = -(x * di)
        return jnp.where(jnp.isfinite(inc), inc, 0.0)

    @jax.jit
    def run(new_dI, state, R, t, aff, snapped):
        # quad tables built ONCE per descent; the LM while body closes
        # over them (ops.interp.build_quad hoisting note)
        from ..ops.interp import build_quad
        quads = (build_quad(new_dI), build_quad(ref_dI[..., 0]))
        r0 = ev(new_dI, state, R, t, aff, snapped, quads)
        state = apply_step(state, r0)

        def cond(c):
            return ~c["quit"]

        def body(c):
            r = c["r"]
            inc = solve(r, c["R"], c["t"], c["lam"])
            dR, dt = lie.se3_exp(inc[:6])
            Rn = jnp.einsum("ij,jk->ik", dR, c["R"], precision="highest")
            tn = jnp.einsum("ij,j->i", dR, c["t"], precision="highest") + dt
            affn = c["aff"] + inc[6:8]
            st = do_step(c["state"], inc, c["lam"])
            rn = ev(new_dI, st, Rn, tn, affn, c["snapped"], quads)
            ec_old, ec_new = calc_ec(st, c["snapped"])
            e_old = r["E_A"] + r["alpha_energy"] + ec_old
            e_new = rn["E_A"] + rn["alpha_energy"] + ec_new
            accept = e_old > e_new

            snapped2 = c["snapped"] | (accept & rn["capped"])
            st_acc = apply_step(st, rn)
            st_acc = opt_reg(st_acc, snapped2)
            new_state = jax.tree.map(
                lambda a, b_: jnp.where(accept, a, b_), st_acc, st
            )
            # on reject, idepth_new must roll back to idepth
            new_state = dict(
                new_state,
                idepth_new=jnp.where(accept, st_acc["idepth_new"], c["state"]["idepth_new"]),
            )
            Rn2 = jnp.where(accept, Rn, c["R"])
            tn2 = jnp.where(accept, tn, c["t"])
            affn2 = jnp.where(accept, affn, c["aff"])
            rn2 = jax.tree.map(lambda a, b_: jnp.where(accept, a, b_), rn, r)
            lam2 = jnp.where(accept, jnp.maximum(c["lam"] * 0.5, 1e-4),
                             jnp.minimum(c["lam"] * 4.0, 1e4))
            fails2 = jnp.where(accept, 0, c["fails"] + 1)
            it2 = c["it"] + 1
            quit_ = (
                ~(jnp.linalg.norm(inc) > 1e-4) | (it2 > max_it) | (fails2 >= 2)
            )
            return dict(R=Rn2, t=tn2, aff=affn2, state=new_state, r=rn2,
                        lam=lam2, fails=fails2, it=it2, quit=quit_,
                        snapped=snapped2)

        carry = dict(R=R, t=t, aff=aff, state=state, r=r0,
                     lam=jnp.float32(0.1), fails=jnp.int32(0), it=jnp.int32(0),
                     quit=jnp.bool_(False), snapped=snapped)
        carry = jax.lax.while_loop(cond, body, carry)
        return carry["R"], carry["t"], carry["aff"], carry["state"], carry["snapped"]

    return run
