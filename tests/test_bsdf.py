import numpy as np
import jax.numpy as jnp
import pytest

from curry_pbrt_tpu.ops import bsdf as B
from curry_pbrt_tpu.ops import math as m


def lam(albedo=0.5, n=64):
    a = jnp.full((n, 3), albedo, jnp.float32)
    return B.Lobe("lambert_r", a)


def ggx(albedo=1.0, rough=0.3, n=64):
    a = jnp.full((n, 3), albedo, jnp.float32)
    alpha = B.roughness_to_alpha(jnp.full((n,), rough, jnp.float32))
    ones = jnp.ones((n,), jnp.float32)
    return B.Lobe("ggx_r", a, alpha_x=alpha, alpha_y=alpha, eta_a=ones, eta_b=1.5 * ones)


def rand_wo(n, seed=0, up=True):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 3).astype(np.float32)
    v[:, 2] = np.abs(v[:, 2]) if up else v[:, 2]
    return jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True))


def rand_u(n, seed=1):
    return jnp.asarray(np.random.RandomState(seed).rand(n, 2).astype(np.float32))


class TestFresnel:
    def test_normal_incidence(self):
        # F0 = ((n1-n2)/(n1+n2))² = (0.5/2.5)² = 0.04
        fr = B.fresnel_dielectric(jnp.asarray([1.0]), jnp.asarray([1.0]), jnp.asarray([1.5]))
        assert abs(float(fr[0]) - 0.04) < 1e-4

    def test_grazing_is_one(self):
        fr = B.fresnel_dielectric(jnp.asarray([1e-4]), jnp.asarray([1.0]), jnp.asarray([1.5]))
        assert float(fr[0]) > 0.98

    def test_tir(self):
        # from dense side beyond critical angle (sin_c = 1/1.5 → cos_c ≈ 0.745)
        fr = B.fresnel_dielectric(jnp.asarray([-0.5]), jnp.asarray([1.0]), jnp.asarray([1.5]))
        assert float(fr[0]) == 1.0

    def test_energy_split(self):
        cos = jnp.asarray(np.linspace(0.05, 1.0, 32, dtype=np.float32))
        fr = B.fresnel_dielectric(cos, jnp.ones(32), jnp.full((32,), 1.5))
        assert np.all((np.asarray(fr) >= 0) & (np.asarray(fr) <= 1))


class TestLambert:
    def test_f_value(self):
        l = lam(0.8, 4)
        wo = rand_wo(4)
        wi = rand_wo(4, seed=2)
        f, pres = B.lobe_f(l, wo, wi)
        np.testing.assert_allclose(np.asarray(f), 0.8 / np.pi, atol=1e-6)
        assert np.all(np.asarray(pres))

    def test_sample_hemisphere_side(self):
        l = lam(0.5, 256)
        wo = rand_wo(256)
        wi, f, pdf, pres = B.lobe_sample(l, wo, rand_u(256))
        wi = np.asarray(wi)
        assert np.all(wi[:, 2] * np.asarray(wo)[:, 2] >= 0)
        np.testing.assert_allclose(np.asarray(pdf), np.abs(wi[:, 2]) / np.pi, atol=1e-5)

    def test_white_furnace_integral(self):
        """∫ f |cos| / pdf with cosine sampling = albedo exactly per sample."""
        n = 1024
        l = lam(0.7, n)
        wo = jnp.tile(jnp.asarray([[0.3, 0.1, 0.95]]), (n, 1))
        wo = m.normalize(wo)
        wi, f, pdf, pres = B.lobe_sample(l, wo, rand_u(n, seed=5))
        est = np.asarray(f)[:, 0] * np.abs(np.asarray(wi)[:, 2]) / np.asarray(pdf)
        np.testing.assert_allclose(est, 0.7, atol=1e-4)


class TestGGX:
    def test_sample_eval_consistency(self):
        """Sampled direction's f from lobe_f must match the f returned by
        lobe_sample, and pdf > 0 for valid samples."""
        g = ggx(n=512)
        wo = rand_wo(512, seed=3)
        wi, f, pdf, pres = B.lobe_sample(g, wo, rand_u(512, seed=4))
        f2, pres2 = B.lobe_f(g, wo, wi)
        sel = np.asarray(pres)
        # random wo near the horizon legitimately reject many VNDF samples
        assert sel.mean() > 0.5
        np.testing.assert_allclose(
            np.asarray(f)[sel], np.asarray(f2)[sel], rtol=1e-3, atol=1e-5
        )
        assert np.all(np.asarray(pdf)[sel] > 0)

    def test_reciprocity(self):
        g = ggx(n=128)
        wo = rand_wo(128, seed=6)
        wi = rand_wo(128, seed=7)
        f1, _ = B.lobe_f(g, wo, wi)
        f2, _ = B.lobe_f(g, wi, wo)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-3, atol=1e-6)

    def test_furnace_bounded(self):
        """Energy: ∫ f cos ≤ 1 — Monte Carlo with the VNDF sampler."""
        n = 8192
        g = ggx(albedo=1.0, rough=0.4, n=n)
        wo = jnp.tile(m.normalize(jnp.asarray([[0.4, 0.0, 0.9]])), (n, 1))
        wi, f, pdf, pres = B.lobe_sample(g, wo, rand_u(n, seed=8))
        sel = np.asarray(pres) & (np.asarray(pdf) > 1e-9)
        est = (
            np.asarray(f)[sel, 0]
            * np.abs(np.asarray(wi)[sel, 2])
            / np.asarray(pdf)[sel]
        )
        total = est.sum() / n
        # dielectric Fresnel at eta 1.5 keeps reflected energy near F0≈0.04
        assert 0.005 < total <= 0.15, total


class TestSpecular:
    def test_mirror_reflection_direction(self):
        n = 8
        l = B.Lobe("spec_r", jnp.ones((n, 3)), fresnel_noop=True)
        wo = rand_wo(n, seed=9)
        wi, f, ok = B.delta_lobe_sample(l, wo)
        wi, wo_ = np.asarray(wi), np.asarray(wo)
        np.testing.assert_allclose(wi[:, :2], -wo_[:, :2], atol=1e-6)
        np.testing.assert_allclose(wi[:, 2], wo_[:, 2], atol=1e-6)
        # f = 1/|cos| so f·|cos| = 1 (perfect mirror)
        np.testing.assert_allclose(np.asarray(f)[:, 0] * np.abs(wi[:, 2]), 1.0, atol=1e-5)

    def test_glass_energy_split(self):
        """Fresnel-weighted reflection + transmission ≈ unit energy."""
        n = 64
        ones = jnp.ones((n,), jnp.float32)
        r = B.Lobe("spec_r", jnp.ones((n, 3)), eta_a=ones, eta_b=1.5 * ones)
        t = B.Lobe("spec_t", jnp.ones((n, 3)), eta_a=ones, eta_b=1.5 * ones)
        wo = rand_wo(n, seed=10)
        wir, fr_, okr = B.delta_lobe_sample(r, wo)
        wit, ft_, okt = B.delta_lobe_sample(t, wo)
        # energy: Fr + (1-Fr) = 1; f values are premultiplied by 1/|cos|
        er = np.asarray(fr_)[:, 0] * np.abs(np.asarray(wir)[:, 2])
        et = np.asarray(ft_)[:, 0] * np.abs(np.asarray(wit)[:, 2]) * np.asarray(okt)
        np.testing.assert_allclose(er + et, 1.0, atol=1e-4)

    def test_refraction_bends(self):
        n = 4
        ones = jnp.ones((n,), jnp.float32)
        t = B.Lobe("spec_t", jnp.ones((n, 3)), eta_a=ones, eta_b=1.5 * ones)
        wo = m.normalize(jnp.tile(jnp.asarray([[0.3, 0.0, 0.954]]), (n, 1)))
        wi, f, ok = B.delta_lobe_sample(t, wo)
        assert np.all(np.asarray(ok))
        wi = np.asarray(wi[0])
        # Snell: sin_t = sin_i/1.5
        sin_i = 0.3 / np.sqrt(0.3**2 + 0.954**2)
        sin_t = abs(wi[0]) / np.linalg.norm(wi)
        np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-4)
        assert wi[2] < 0


class TestBSDFAlgebra:
    def test_eval_pdf_reflect_bucket(self):
        n = 32
        lobes = [lam(0.6, n), lam(0.2, n)]
        wo = rand_wo(n, seed=11)
        wi = rand_wo(n, seed=12)
        f, pdf, pres = B.bsdf_eval_pdf(lobes, wo, wi)
        np.testing.assert_allclose(np.asarray(f)[:, 0], 0.8 / np.pi, atol=1e-5)
        # mean cosine pdf over the 2-lobe reflect bucket = |cos|/π
        np.testing.assert_allclose(
            np.asarray(pdf), np.abs(np.asarray(wi)[:, 2]) / np.pi, atol=1e-5
        )

    def test_sample_nondelta_uniform_choice(self):
        n = 4096
        lobes = [lam(1.0, n), ggx(n=n)]
        wo = jnp.tile(m.normalize(jnp.asarray([[0.2, 0.1, 0.97]])), (n, 1))
        u_pick = jnp.asarray(np.random.RandomState(13).rand(n).astype(np.float32))
        u2 = jnp.asarray(np.random.RandomState(14).rand(n).astype(np.float32))
        wi, f, pdf, pres = B.bsdf_sample_nondelta(lobes, wo, u_pick, u2)
        assert np.asarray(pres).mean() > 0.7
        assert np.all(np.asarray(pdf)[np.asarray(pres)] > 0)

    def test_sample_delta_luminance_weights(self):
        n = 4096
        bright = B.Lobe("spec_r", jnp.full((n, 3), 0.9), fresnel_noop=True)
        dim = B.Lobe("spec_r", jnp.full((n, 3), 0.1), fresnel_noop=True)
        wo = rand_wo(n, seed=15)
        u = jnp.asarray(np.random.RandomState(16).rand(n).astype(np.float32))
        wi, f, pdf, pres = B.bsdf_sample_delta([bright, dim], wo, u)
        # selection probability proportional to luminance of sampled f —
        # both lobes produce the same wi here so check pdf values cluster
        pdfs = np.unique(np.round(np.asarray(pdf), 4))
        assert len(pdfs) == 2
        # weights ∝ 0.9 : 0.1 regardless of cos factor (shared 1/|cos|)
        np.testing.assert_allclose(sorted(pdfs), [0.1, 0.9], atol=1e-3)
        frac_bright = (np.abs(np.asarray(pdf) - 0.9) < 1e-3).mean()
        assert abs(frac_bright - 0.9) < 0.03

    def test_sample_f_bucket_probabilities(self):
        """plastic-like: 2 non-delta + 1 delta → non-delta picked 2/3."""
        n = 8192
        lobes = [lam(0.5, n), ggx(n=n), B.Lobe("spec_r", jnp.ones((n, 3)), fresnel_noop=True)]
        wo = jnp.tile(m.normalize(jnp.asarray([[0.1, 0.2, 0.97]])), (n, 1))
        ub = jnp.asarray(np.random.RandomState(17).rand(n).astype(np.float32))
        ue = jnp.asarray(np.random.RandomState(18).rand(n).astype(np.float32))
        wi, f, pdf, pres, is_delta = B.bsdf_sample(lobes, wo, ub, ue)
        frac_delta = np.asarray(is_delta).mean()
        assert abs(frac_delta - 1.0 / 3.0) < 0.02

    def test_oren_nayar_reduces_to_lambert_at_sigma0(self):
        n = 16
        a = jnp.full((n, 3), 0.5, jnp.float32)
        on = B.Lobe("oren_nayar", a, on_a=jnp.ones((n,)), on_b=jnp.zeros((n,)))
        wo = rand_wo(n, seed=19)
        wi = rand_wo(n, seed=20)
        f, _ = B.lobe_f(on, wo, wi)
        np.testing.assert_allclose(np.asarray(f), 0.5 / np.pi, atol=1e-6)
