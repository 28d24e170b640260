"""Batched BSDF lobes and per-material-instance BSDF algebra.

The reference represents a BSDF as a runtime bag of boxed lobe trait objects
(/root/reference/src/material/bxdf/mod.rs). Here a material instance compiles
to a STATIC list of lobes (known at trace time), each lobe carrying batched
per-ray parameters (albedo after texture eval, GGX alphas, IORs). All lobe
math below operates in the shading-local frame (normal = +z) on (N, ...) SoA
arrays — the batch dimension replaces the reference's per-ray virtual calls,
and `jnp.where` masks replace its Option returns.

Lobe kinds (suffix _r = reflect bucket, _t = transmit bucket):
  non-delta: lambert_r, lambert_t, oren_nayar, ggx_r, ggx_t
  delta:     spec_r, spec_t

Reference algorithm mapping:
  bsdf_eval_pdf        ← BSDF::no_delta_f_pdf      (bxdf/mod.rs:176-198)
  bsdf_sample_nondelta ← BSDF::sample_no_delta_f   (bxdf/mod.rs:148-159)
  bsdf_sample_delta    ← BSDF::sample_delta_f      (bxdf/mod.rs:160-175)
  bsdf_sample          ← BSDF::sample_f            (bxdf/mod.rs:199-214)
  delta lobes          ← DeltaBxDF impls           (bxdf/specular.rs)
  GGX                  ← TrowbridgeReitz           (bxdf/microfacet.rs)

Documented divergence: the reference's default lobe pdf is wi.z/π even when
wi is in the transmission hemisphere (bxdf/mod.rs:38-40, can be negative); we
use |wi.z|/π.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp

from curry_pbrt_tpu.dtypes import INV_PI, PI, Float
from curry_pbrt_tpu.ops import math as m

NONDELTA_KINDS = ("lambert_r", "lambert_t", "oren_nayar", "ggx_r", "ggx_t")
DELTA_KINDS = ("spec_r", "spec_t")
REFLECT_KINDS = ("lambert_r", "oren_nayar", "ggx_r")


@dataclass
class Lobe:
    """One lobe with batched parameters. `kind` is static; arrays are (N, …)."""

    kind: str
    albedo: jnp.ndarray  # (N,3) — texture-evaluated, mix/opacity scales baked in
    # oren-nayar precomputed A/B (from sigma):
    on_a: Optional[jnp.ndarray] = None  # (N,)
    on_b: Optional[jnp.ndarray] = None
    # GGX:
    alpha_x: Optional[jnp.ndarray] = None  # (N,)
    alpha_y: Optional[jnp.ndarray] = None
    # dielectric interface (spec_*, ggx_*):
    eta_a: Optional[jnp.ndarray] = None  # (N,)
    eta_b: Optional[jnp.ndarray] = None
    fresnel_noop: bool = False  # mirror (specular.rs:17-23)

    @property
    def is_delta(self) -> bool:
        return self.kind in DELTA_KINDS

    @property
    def is_reflect(self) -> bool:
        return self.kind in REFLECT_KINDS


def luminance(rgb):
    return (
        0.212671 * rgb[..., 0] + 0.715160 * rgb[..., 1] + 0.072169 * rgb[..., 2]
    )


# ---------------------------------------------------------------------------
# Fresnel — specular.rs:24-44


def fresnel_dielectric(cos_i, eta_i, eta_t):
    """Unpolarized dielectric Fresnel reflectance; handles both sides and TIR."""
    ei = jnp.where(cos_i > 0, eta_i, eta_t)
    et = jnp.where(cos_i > 0, eta_t, eta_i)
    ci = jnp.abs(cos_i)
    si = m.safe_sqrt(1.0 - ci * ci)
    st = si * ei / et
    tir = st >= 1.0
    ct = m.safe_sqrt(1.0 - st * st)
    r_par = (et * ci - ei * ct) / (et * ci + ei * ct)
    r_perp = (ei * ci - et * ct) / (ei * ci + et * ct)
    fr = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(tir, 1.0, fr)


# ---------------------------------------------------------------------------
# Trowbridge-Reitz / GGX — microfacet.rs


def roughness_to_alpha(rough):
    """pbrt's log-polynomial remap (microfacet.rs:28-33)."""
    rough = jnp.maximum(rough, 1e-3)
    x = jnp.log(rough)
    x2 = x * x
    return (
        1.62142 + 0.819955 * x + 0.1734 * x2 + 0.0171201 * x * x2 + 0.000640711 * x2 * x2
    )


def tr_d(wh, alpha_x, alpha_y):
    t2 = m.tan2_theta(wh)
    bad = jnp.isnan(t2) | jnp.isinf(t2)
    t2 = jnp.where(bad, 0.0, t2)
    c2 = m.cos2_theta(wh)
    c4 = c2 * c2
    e = (m.cos2_phi(wh) / (alpha_x * alpha_x) + m.sin2_phi(wh) / (alpha_y * alpha_y)) * t2
    d = 1.0 / (PI * alpha_x * alpha_y * jnp.maximum(c4, 1e-20) * (1.0 + e) * (1.0 + e))
    return jnp.where(bad, 0.0, d)


def tr_lambda(w, alpha_x, alpha_y):
    abs_tan = jnp.abs(m.tan_theta(w))
    bad = jnp.isnan(abs_tan) | jnp.isinf(abs_tan)
    abs_tan = jnp.where(bad, 0.0, abs_tan)
    alpha = jnp.sqrt(m.cos2_phi(w) * alpha_x * alpha_x + m.sin2_phi(w) * alpha_y * alpha_y)
    a2t2 = (alpha * abs_tan) ** 2
    lam = (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0
    return jnp.where(bad, 0.0, lam)


def tr_g(wo, wi, ax, ay):
    return 1.0 / (1.0 + tr_lambda(wo, ax, ay) + tr_lambda(wi, ax, ay))


def tr_g1(w, ax, ay):
    return 1.0 / (1.0 + tr_lambda(w, ax, ay))


def tr_sample_wh(wo, u, ax, ay):
    """Visible-normal sampling (Heitz), exactly the reference's branchy
    version vectorized with masks (microfacet.rs:39-92).

    Returns (wh: (N,3), pdf: (N,)).
    """
    flip = wo[..., 2] < 0.0
    wi = jnp.where(flip[..., None], -wo, wo)
    wi_str = jnp.stack(
        [ax * wi[..., 0], ay * wi[..., 1], wi[..., 2]], axis=-1
    )
    wi_str = m.normalize(wi_str)
    cti = m.cos_theta(wi_str)

    ux, uy = u[..., 0], u[..., 1]

    # near-normal incidence branch (cti > 0.9999)
    r_n = jnp.sqrt(ux / jnp.maximum(1.0 - ux, 1e-12))
    phi_n = 2.0 * PI * uy
    sx_n = r_n * jnp.cos(phi_n)
    sy_n = r_n * jnp.sin(phi_n)

    # general branch
    st = m.safe_sqrt(1.0 - cti * cti)
    tan_t = st / jnp.where(cti == 0, 1.0, cti)
    a = 1.0 / jnp.where(tan_t == 0, 1.0, tan_t)
    g1 = 2.0 / (1.0 + jnp.sqrt(1.0 + 1.0 / jnp.maximum(a * a, 1e-20)))
    A = 2.0 * ux / jnp.maximum(g1, 1e-12) - 1.0
    tmp = 1.0 / jnp.where(A * A - 1.0 == 0, 1e-10, A * A - 1.0)
    tmp = jnp.minimum(tmp, 1e10)
    B = tan_t
    D = m.safe_sqrt(B * B * tmp * tmp - (A * A - B * B) * tmp)
    sx1 = B * tmp - D
    sx2 = B * tmp + D
    sx_g = jnp.where((A < 0) | (sx2 > 1.0 / jnp.where(tan_t == 0, 1e-12, tan_t)), sx1, sx2)
    S = jnp.where(uy > 0.5, 1.0, -1.0)
    u2b = jnp.where(uy > 0.5, 2.0 * (uy - 0.5), 2.0 * (0.5 - uy))
    z = (u2b * (u2b * (u2b * 0.27385 - 0.73369) + 0.46341)) / (
        u2b * (u2b * (u2b * 0.093073 + 0.309420) - 1.0) + 0.597999
    )
    sy_g = S * z * jnp.sqrt(1.0 + sx_g * sx_g)

    near = cti > 0.9999
    slope_x = jnp.where(near, sx_n, sx_g)
    slope_y = jnp.where(near, sy_n, sy_g)

    cp, sp = m.cos_phi(wi_str), m.sin_phi(wi_str)
    rx = cp * slope_x - sp * slope_y
    ry = sp * slope_x + cp * slope_y
    slope_x = rx * ax
    slope_y = ry * ay
    wh = m.normalize(jnp.stack([-slope_x, -slope_y, jnp.ones_like(slope_x)], axis=-1))
    wh = jnp.where(flip[..., None], -wh, wh)
    pdf = (
        tr_d(wh, ax, ay)
        * tr_g1(wo, ax, ay)
        * jnp.abs(m.dot(wo, wh))
        / jnp.maximum(jnp.abs(m.cos_theta(wo)), 1e-12)
    )
    return wh, pdf


# ---------------------------------------------------------------------------
# non-delta lobe eval / pdf / sample


def lobe_f(lobe: Lobe, wo, wi):
    """(f: (N,3), present: (N,)). Masked analog of `BxDF::f` returning None."""
    k = lobe.kind
    if k in ("lambert_r", "lambert_t"):
        return lobe.albedo * INV_PI, jnp.ones(wo.shape[:-1], bool)
    if k == "oren_nayar":
        ci, co = m.cos_theta(wi), m.cos_theta(wo)
        cond = ci < co
        sin_alpha = jnp.where(cond, m.sin_theta(wi), m.sin_theta(wo))
        tan_beta = jnp.where(cond, m.tan_theta(wo), m.tan_theta(wi))
        val = (
            lobe.on_a
            + lobe.on_b * jnp.maximum(0.0, m.cos_delta_phi(wi, wo)) * sin_alpha * tan_beta
        ) * INV_PI
        return lobe.albedo * val[..., None], jnp.ones(wo.shape[:-1], bool)
    if k == "ggx_r":
        co = jnp.abs(m.cos_theta(wo))
        ci = jnp.abs(m.cos_theta(wi))
        win = m.normalize(wi)
        won = m.normalize(wo)
        wh = win + won
        degenerate = (jnp.sum(jnp.abs(wh), -1) == 0.0) | (co == 0.0) | (ci == 0.0)
        wh = m.normalize(jnp.where(degenerate[..., None], wo + jnp.asarray([0.0, 0.0, 1.0]), wh))
        fr_cos = m.dot(win, jnp.where((wh[..., 2:3] < 0), -wh, wh))
        fr = (
            jnp.ones_like(fr_cos)
            if lobe.fresnel_noop
            else fresnel_dielectric(fr_cos, lobe.eta_a, lobe.eta_b)
        )
        f = (
            lobe.albedo
            * (
                tr_d(wh, lobe.alpha_x, lobe.alpha_y)
                * tr_g(won, win, lobe.alpha_x, lobe.alpha_y)
                * fr
                / jnp.maximum(4.0 * co * ci, 1e-12)
            )[..., None]
        )
        return jnp.where(degenerate[..., None], 0.0, f), ~degenerate
    if k == "ggx_t":
        co = m.cos_theta(wo)
        ci = m.cos_theta(wi)
        same_side = co * ci > 0
        degenerate = (ci == 0.0) | (co == 0.0)
        eta = jnp.where(co > 0, lobe.eta_b / lobe.eta_a, lobe.eta_a / lobe.eta_b)
        wh = m.normalize(wo + wi * eta[..., None])
        wh = jnp.where(wh[..., 2:3] < 0, -wh, wh)
        sqrt_denom = m.dot(wo, wh) + eta * m.dot(wi, wh)
        fr = fresnel_dielectric(m.dot(wo, wh), lobe.eta_a, lobe.eta_b)
        factor = 1.0 / eta
        val = jnp.abs(
            tr_d(wh, lobe.alpha_x, lobe.alpha_y)
            * tr_g(wo, wi, lobe.alpha_x, lobe.alpha_y)
            * eta
            * eta
            * jnp.abs(m.dot(wi, wh))
            * jnp.abs(m.dot(wo, wh))
            * factor
            * factor
            / jnp.where(
                (ci * co * sqrt_denom * sqrt_denom) == 0,
                1.0,
                ci * co * sqrt_denom * sqrt_denom,
            )
        )
        f = (1.0 - fr)[..., None] * lobe.albedo * val[..., None]
        present = ~same_side & ~degenerate
        return jnp.where(present[..., None], f, 0.0), present
    raise ValueError(k)


def lobe_pdf(lobe: Lobe, wo, wi):
    """Reference default pdf = cosθ/π for every non-delta lobe (see module
    docstring for the |·| divergence). Microfacet lobes do NOT override pdf
    for eval (f_pdf) in the reference — only their sample_f returns the VNDF
    pdf — so eval-side pdf is cosine for all kinds."""
    return jnp.abs(m.cos_theta(wi)) * INV_PI


def lobe_sample(lobe: Lobe, wo, u):
    """Sample wi from one lobe: (wi, f, pdf, present).

    Default: cosine hemisphere flipped to the lobe's side of wo
    (bxdf/mod.rs:20-37); GGX lobes use VNDF sampling (microfacet.rs:166-180,
    246-266).
    """
    k = lobe.kind
    if k in ("lambert_r", "lambert_t", "oren_nayar"):
        wi, pdf = m.cosine_sample_hemisphere(u)
        z = wi[..., 2:3]  # ≥ 0 from the sampler
        if k == "lambert_t":
            # transmit: flip to the FAR side of wo (bxdf/mod.rs:28-32)
            zt = jnp.where(wo[..., 2:3] > 0, -z, z)
        else:
            # reflect: flip to wo's side (bxdf/mod.rs:23-27)
            zt = jnp.where(wo[..., 2:3] < 0, -z, z)
        wi = jnp.concatenate([wi[..., :2], zt], axis=-1)
        f, present = lobe_f(lobe, wo, wi)
        return wi, f, pdf, present
    if k == "ggx_r":
        wh, wh_pdf = tr_sample_wh(wo, u, lobe.alpha_x, lobe.alpha_y)
        dot_owh = m.dot(wo, wh)
        wi = -wo + 2.0 * dot_owh[..., None] * wh
        ok = (wo[..., 2] != 0) & (dot_owh >= 0) & (wi[..., 2] * wo[..., 2] > 0)
        f, fp = lobe_f(lobe, wo, wi)
        pdf = wh_pdf / jnp.maximum(4.0 * dot_owh, 1e-12)
        return wi, f, jnp.where(ok, pdf, 0.0), ok & fp
    if k == "ggx_t":
        wh, wh_pdf = tr_sample_wh(wo, u, lobe.alpha_x, lobe.alpha_y)
        dot_owh = m.dot(wo, wh)
        pos = m.cos_theta(wo) > 0
        eta_i = jnp.where(pos, lobe.eta_a / lobe.eta_b, lobe.eta_b / lobe.eta_a)
        eta_o = jnp.where(pos, lobe.eta_b / lobe.eta_a, lobe.eta_a / lobe.eta_b)
        wi, refr_ok = m.refract(wo, wh, eta_i)
        ok = (wo[..., 2] != 0) & (dot_owh >= 0) & refr_ok
        sqrt_denom = m.dot(wo, wh) + eta_o * m.dot(wi, wh)
        dwh_dwi = jnp.abs(eta_o * eta_o * m.dot(wi, wh)) / jnp.maximum(
            sqrt_denom * sqrt_denom, 1e-12
        )
        f, fp = lobe_f(lobe, wo, wi)
        return wi, f, jnp.where(ok, wh_pdf * dwh_dwi, 0.0), ok & fp
    raise ValueError(k)


# ---------------------------------------------------------------------------
# delta lobes — specular.rs


def delta_lobe_sample(lobe: Lobe, wo):
    """(wi, f, present) for a delta lobe."""
    k = lobe.kind
    if k == "spec_r":
        wi = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)
        ci = m.cos_theta(wi)
        fr = (
            jnp.ones_like(ci)
            if lobe.fresnel_noop
            else fresnel_dielectric(ci, lobe.eta_a, lobe.eta_b)
        )
        f = lobe.albedo * (fr / jnp.maximum(jnp.abs(ci), 1e-12))[..., None]
        return wi, f, fr != 0.0
    if k == "spec_t":
        pos = m.cos_theta(wo) > 0
        eta = jnp.where(pos, lobe.eta_a / lobe.eta_b, lobe.eta_b / lobe.eta_a)
        n = jnp.concatenate(
            [jnp.zeros_like(wo[..., :2]), jnp.sign(wo[..., 2:3])], axis=-1
        )
        wi, ok = m.refract(wo, n, eta)
        ft = 1.0 - fresnel_dielectric(m.cos_theta(wi), lobe.eta_a, lobe.eta_b)
        f = lobe.albedo * (ft / jnp.maximum(jnp.abs(m.cos_theta(wi)), 1e-12))[..., None]
        return wi, f, ok & (ft != 0.0)
    raise ValueError(k)


# ---------------------------------------------------------------------------
# BSDF-level algebra over a static lobe list


def bsdf_eval_pdf(lobes: List[Lobe], wo, wi):
    """no_delta_f_pdf: sum f and mean cosine pdf over the hemisphere bucket
    selected by sign(wo.z · wi.z) (bxdf/mod.rs:176-198; the local normal is
    +z because shading normal == geometric normal in the reference,
    BSDF::new(n, n) at every call site).

    Returns (f: (N,3), pdf: (N,), present: (N,)).
    """
    nd = [l for l in lobes if not l.is_delta]
    n_lanes = wo.shape[:-1]
    f = jnp.zeros(n_lanes + (3,), Float)
    pdf = jnp.zeros(n_lanes, Float)
    present = jnp.zeros(n_lanes, bool)
    if not nd:
        return f, pdf, present
    reflect = wo[..., 2] * wi[..., 2] > 0
    n_refl = sum(1 for l in nd if l.is_reflect)
    n_trans = len(nd) - n_refl
    f_r = jnp.zeros(n_lanes + (3,), Float)
    pdf_r = jnp.zeros(n_lanes, Float)
    pres_r = jnp.zeros(n_lanes, bool)
    f_t = jnp.zeros(n_lanes + (3,), Float)
    pdf_t = jnp.zeros(n_lanes, Float)
    pres_t = jnp.zeros(n_lanes, bool)
    for l in nd:
        lf, lp = lobe_f(l, wo, wi)
        lpdf = lobe_pdf(l, wo, wi)
        # the reference's if-let only accumulates (f, pdf) when f is Some
        if l.is_reflect:
            f_r = f_r + jnp.where(lp[..., None], lf, 0.0)
            pdf_r = pdf_r + jnp.where(lp, lpdf, 0.0)
            pres_r = pres_r | lp
        else:
            f_t = f_t + jnp.where(lp[..., None], lf, 0.0)
            pdf_t = pdf_t + jnp.where(lp, lpdf, 0.0)
            pres_t = pres_t | lp
    if n_refl:
        pdf_r = pdf_r / Float(n_refl)
    if n_trans:
        pdf_t = pdf_t / Float(n_trans)
    if n_refl and n_trans:
        f = jnp.where(reflect[..., None], f_r, f_t)
        pdf = jnp.where(reflect, pdf_r, pdf_t)
        present = jnp.where(reflect, pres_r, pres_t)
    elif n_refl:
        f = jnp.where(reflect[..., None], f_r, 0.0)
        pdf = jnp.where(reflect, pdf_r, 0.0)
        present = reflect & pres_r
    else:
        f = jnp.where(~reflect[..., None], f_t, 0.0)
        pdf = jnp.where(~reflect, pdf_t, 0.0)
        present = (~reflect) & pres_t
    return f, pdf, present


def bsdf_sample_nondelta(lobes: List[Lobe], wo, u_pick, u2):
    """sample_no_delta_f: uniform lobe choice over ALL non-delta lobes, pdf
    divided by the count (bxdf/mod.rs:136-159).

    Returns (wi, f, pdf, present).
    """
    nd = [l for l in lobes if not l.is_delta]
    n_lanes = wo.shape[:-1]
    if not nd:
        z3 = jnp.zeros(n_lanes + (3,), Float)
        return z3, z3, jnp.zeros(n_lanes, Float), jnp.zeros(n_lanes, bool)
    nb = len(nd)
    idx, remap = m.sample_usize_remap(u_pick, nb)
    u = jnp.stack([remap, u2], axis=-1)
    wi_o = jnp.zeros(n_lanes + (3,), Float)
    f_o = jnp.zeros(n_lanes + (3,), Float)
    pdf_o = jnp.zeros(n_lanes, Float)
    pres_o = jnp.zeros(n_lanes, bool)
    for i, l in enumerate(nd):
        wi, f, pdf, pres = lobe_sample(l, wo, u)
        sel = idx == i
        wi_o = jnp.where(sel[..., None], wi, wi_o)
        f_o = jnp.where(sel[..., None], f, f_o)
        pdf_o = jnp.where(sel, pdf, pdf_o)
        pres_o = jnp.where(sel, pres, pres_o)
    return wi_o, f_o, pdf_o / Float(nb), pres_o


def bsdf_sample_delta(lobes: List[Lobe], wo, u):
    """sample_delta_f: luminance-weighted choice among the delta lobes that
    produced a sample (bxdf/mod.rs:160-175).

    Returns (wi, f, pdf, present).
    """
    dl = [l for l in lobes if l.is_delta]
    n_lanes = wo.shape[:-1]
    z3 = jnp.zeros(n_lanes + (3,), Float)
    if not dl:
        return z3, z3, jnp.zeros(n_lanes, Float), jnp.zeros(n_lanes, bool)
    samples = [delta_lobe_sample(l, wo) for l in dl]
    weights = [jnp.where(ok, jnp.maximum(luminance(f), 0.0), 0.0) for (_, f, ok) in samples]
    total = sum(weights)
    any_ok = total > 0
    safe_total = jnp.where(any_ok, total, 1.0)
    # CDF walk over the per-lane weight list (the reference builds a
    # Distribution1D over the successful lobes' luminances)
    target = u * safe_total
    cum = jnp.zeros(n_lanes, Float)
    chosen = jnp.full(n_lanes, len(dl) - 1, jnp.int32)
    done = jnp.zeros(n_lanes, bool)
    for i, w in enumerate(weights):
        cum = cum + w
        take = (~done) & (target <= cum) & (w > 0)
        chosen = jnp.where(take, i, chosen)
        done = done | take
    wi_o, f_o = z3, z3
    pdf_o = jnp.zeros(n_lanes, Float)
    pres_o = jnp.zeros(n_lanes, bool)
    for i, ((wi, f, ok), w) in enumerate(zip(samples, weights)):
        sel = (chosen == i) & ok
        wi_o = jnp.where(sel[..., None], wi, wi_o)
        f_o = jnp.where(sel[..., None], f, f_o)
        pdf_o = jnp.where(sel, w / safe_total, pdf_o)
        pres_o = jnp.where(sel, True, pres_o)
    pres_o = pres_o & any_ok
    return wi_o, f_o, pdf_o, pres_o


def bsdf_sample(lobes: List[Lobe], wo, u_bucket, u_extra):
    """sample_f: pick delta vs non-delta bucket with probability proportional
    to lobe counts, then sample within (bxdf/mod.rs:199-214).

    Returns (wi, f, pdf, present, is_delta_mask).
    """
    nb = sum(1 for l in lobes if not l.is_delta)
    ndl = sum(1 for l in lobes if l.is_delta)
    n_lanes = wo.shape[:-1]
    z3 = jnp.zeros(n_lanes + (3,), Float)
    if nb == 0 and ndl == 0:
        z = jnp.zeros(n_lanes, Float)
        return z3, z3, z, jnp.zeros(n_lanes, bool), jnp.zeros(n_lanes, bool)
    total = Float(nb + ndl)
    p_nb = Float(nb) / total
    if ndl == 0:
        # counts [nb, 0] → cdf [1, 1]: bucket pdf 1, remap = 1 - u
        wi, f, pdf, pres = bsdf_sample_nondelta(lobes, wo, 1.0 - u_bucket, u_extra)
        return wi, f, pdf, pres, jnp.zeros(n_lanes, bool)
    if nb == 0:
        # counts [0, nd] → cdf [0, 1]: bucket pdf 1, remap = 1 - u
        wi, f, pdf, pres = bsdf_sample_delta(lobes, wo, 1.0 - u_bucket)
        return wi, f, pdf, pres, jnp.ones(n_lanes, bool)
    # both buckets present: cdf = [p_nb, 1]; remap = (cdf_i - u)/pdf_i
    pick_nd = u_bucket <= p_nb
    remap_nd = (p_nb - u_bucket) / p_nb
    remap_d = (1.0 - u_bucket) / (1.0 - p_nb)
    wi_n, f_n, pdf_n, pres_n = bsdf_sample_nondelta(lobes, wo, remap_nd, u_extra)
    wi_d, f_d, pdf_d, pres_d = bsdf_sample_delta(lobes, wo, remap_d)
    wi = jnp.where(pick_nd[..., None], wi_n, wi_d)
    f = jnp.where(pick_nd[..., None], f_n, f_d)
    pdf = jnp.where(pick_nd, pdf_n * p_nb, pdf_d * (1.0 - p_nb))
    pres = jnp.where(pick_nd, pres_n, pres_d)
    return wi, f, pdf, pres, ~pick_nd


def bsdf_sample_all_delta(lobes: List[Lobe], wo):
    """sample_all_delta_f — every delta lobe's (wi, f, ok), for the direct
    lighting integrator's specular recursion (bxdf/mod.rs:127-135)."""
    return [delta_lobe_sample(l, wo) for l in lobes if l.is_delta]
