import numpy as np
import jax.numpy as jnp
import pytest

from curry_pbrt_tpu.ops import math as m


def rand(*shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


class TestVectors:
    def test_normalize(self):
        v = rand(10, 3) - 0.5
        n = np.asarray(m.normalize(jnp.asarray(v)))
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)

    def test_coordinate_system_orthonormal(self):
        z = np.asarray(m.normalize(jnp.asarray(rand(64, 3) - 0.5)))
        x, y = m.coordinate_system(jnp.asarray(z))
        x, y = np.asarray(x), np.asarray(y)
        np.testing.assert_allclose(np.sum(x * z, -1), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.sum(x * y, -1), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(x, axis=-1), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.linalg.norm(y, axis=-1), 1.0, atol=1e-4)

    def test_local_world_roundtrip(self):
        z = np.asarray(m.normalize(jnp.asarray(rand(32, 3, seed=1) - 0.5)))
        x, y = m.coordinate_system(jnp.asarray(z))
        w = np.asarray(m.normalize(jnp.asarray(rand(32, 3, seed=2) - 0.5)))
        local = m.to_local(jnp.asarray(w), x, y, jnp.asarray(z))
        back = m.to_world(local, x, y, jnp.asarray(z))
        np.testing.assert_allclose(np.asarray(back), w, atol=1e-4)


class TestSampling:
    def test_concentric_disk_in_unit_disk(self):
        u = rand(4096, 2)
        p = np.asarray(m.concentric_sample_disk(jnp.asarray(u)))
        assert np.all(np.linalg.norm(p, axis=-1) <= 1.0 + 1e-6)
        # area uniformity: quadrant counts roughly equal
        counts = [
            np.sum((p[:, 0] > 0) & (p[:, 1] > 0)),
            np.sum((p[:, 0] < 0) & (p[:, 1] > 0)),
            np.sum((p[:, 0] < 0) & (p[:, 1] < 0)),
            np.sum((p[:, 0] > 0) & (p[:, 1] < 0)),
        ]
        assert max(counts) - min(counts) < 4096 * 0.08

    def test_concentric_disk_degenerate(self):
        p = np.asarray(m.concentric_sample_disk(jnp.asarray([[0.5, 0.5], [0.5, 0.25]], jnp.float32)))
        np.testing.assert_allclose(p[0], [0.0, 0.0], atol=1e-7)

    def test_cosine_hemisphere_pdf(self):
        u = rand(512, 2, seed=3)
        w, pdf = m.cosine_sample_hemisphere(jnp.asarray(u))
        w, pdf = np.asarray(w), np.asarray(pdf)
        np.testing.assert_allclose(pdf, w[:, 2] / np.pi, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-5)
        # E[cos] under cosine-weighted sampling = 2/3
        assert abs(np.mean(w[:, 2]) - 2.0 / 3.0) < 0.03

    def test_uniform_sphere_mean_z(self):
        # the reference's "hemisphere" sampler actually covers the sphere
        u = rand(8192, 2, seed=4)
        w = np.asarray(m.uniform_sample_hemisphere(jnp.asarray(u)))
        assert abs(np.mean(w[:, 2])) < 0.05
        assert w[:, 2].min() < -0.9 and w[:, 2].max() > 0.9

    def test_uniform_triangle_barycentric(self):
        u = rand(1024, 2, seed=5)
        b = np.asarray(m.uniform_sample_triangle(jnp.asarray(u)))
        assert np.all(b >= 0) and np.all(b.sum(-1) <= 1.0 + 1e-6)

    def test_sample_usize_remap(self):
        idx, remap = m.sample_usize_remap(jnp.asarray([0.0, 0.49, 0.99], jnp.float32), 4)
        np.testing.assert_array_equal(np.asarray(idx), [0, 1, 3])
        assert np.all((np.asarray(remap) >= 0) & (np.asarray(remap) < 1))


class TestRefraction:
    def test_snell(self):
        n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        wo = m.normalize(jnp.asarray([[0.3, 0.0, 0.8]], jnp.float32))
        eta = jnp.asarray([1.0 / 1.5], jnp.float32)
        wi, ok = m.refract(wo, n, eta)
        assert bool(ok[0])
        wi = np.asarray(wi)[0]
        wo_ = np.asarray(wo)[0]
        sin_i = np.linalg.norm(wo_[:2])
        sin_t = np.linalg.norm(wi[:2] / np.linalg.norm(wi))
        np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-5)
        assert wi[2] < 0  # transmitted to other side

    def test_total_internal_reflection(self):
        n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        wo = m.normalize(jnp.asarray([[0.9, 0.0, 0.2]], jnp.float32))
        _, ok = m.refract(wo, n, jnp.asarray([1.5], jnp.float32))
        assert not bool(ok[0])


class TestMisc:
    def test_power_heuristic(self):
        assert float(m.power_heuristic(jnp.float32(1.0), jnp.float32(1.0))) == pytest.approx(0.5)
        assert float(m.power_heuristic(jnp.float32(2.0), jnp.float32(0.0))) == pytest.approx(1.0)

    def test_spherical_roundtrip(self):
        w = np.asarray(m.normalize(jnp.asarray(rand(128, 3, seed=7) - 0.5)))
        uv = m.spherical_to_normalized_phi_theta(jnp.asarray(w))
        back = np.asarray(m.normalized_phi_theta_to_spherical(uv))
        np.testing.assert_allclose(back, w, atol=1e-4)

    def test_gamma_correct_roundtrip(self):
        f = jnp.linspace(0.0, 1.0, 64)
        g = m.gamma_correct(f)
        assert float(g[0]) == 0.0
        assert np.all(np.diff(np.asarray(g)) > 0)
