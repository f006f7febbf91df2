import jax
import jax.numpy as jnp
import numpy as np

from dvdgan_tpu.ops import spectral_norm as sn


def test_sigma_converges_to_svd():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (37, 53))
    true_sigma = float(jnp.linalg.svd(w, compute_uv=False)[0])
    u = sn.sn_init(jax.random.PRNGKey(1), {"layer": {"w": w}})["layer/w"]
    sigma = None
    for _ in range(200):
        sigma, u = sn.sigma_and_update(w, u)
    assert abs(float(sigma) - true_sigma) / true_sigma < 1e-4


def test_conv_kernel_sigma_matches_flattened_matrix():
    key = jax.random.PRNGKey(2)
    w = jax.random.normal(key, (3, 3, 8, 16))
    u = sn.sn_init(jax.random.PRNGKey(3), {"c": {"w": w}})["c/w"]
    for _ in range(300):
        sigma, u = sn.sigma_and_update(w, u)
    ref = float(jnp.linalg.svd(w.reshape(-1, 16), compute_uv=False)[0])
    assert abs(float(sigma) - ref) / ref < 1e-4


def test_normalize_tree_selects_w_and_emb_only():
    params = {
        "conv": {"w": jnp.ones((3, 3, 2, 4)), "b": jnp.zeros((4,))},
        "embed": {"emb": jnp.eye(5)},
        "bn": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))},
    }
    u = sn.sn_init(jax.random.PRNGKey(0), params)
    assert set(u) == {"conv/w", "embed/emb"}
    p_sn, new_u = sn.sn_normalize(params, u, update=True)
    # non-matching leaves untouched
    assert jnp.array_equal(p_sn["bn"]["scale"], params["bn"]["scale"])
    assert jnp.array_equal(p_sn["conv"]["b"], params["conv"]["b"])
    # matching leaves rescaled; u advanced
    assert not jnp.array_equal(p_sn["conv"]["w"], params["conv"]["w"])
    assert not np.allclose(new_u["conv/w"], u["conv/w"])


def test_update_flag_freezes_u():
    params = {"l": {"w": jax.random.normal(jax.random.PRNGKey(0), (6, 6))}}
    u = sn.sn_init(jax.random.PRNGKey(1), params)
    _, u_frozen = sn.sn_normalize(params, u, update=False)
    assert np.allclose(u_frozen["l/w"], u["l/w"])


def test_normalized_weight_has_unit_sigma():
    params = {"l": {"w": 10.0 * jax.random.normal(jax.random.PRNGKey(4), (24, 24))}}
    u = sn.sn_init(jax.random.PRNGKey(5), params)
    for _ in range(100):
        params_sn, u = sn.sn_normalize(params, u, update=True)
    sigma = jnp.linalg.svd(params_sn["l"]["w"], compute_uv=False)[0]
    assert abs(float(sigma) - 1.0) < 1e-3


def test_grad_flows_through_sigma():
    # d/dW of sum(W/sigma(W)) must differ from treating sigma as a constant.
    w = jax.random.normal(jax.random.PRNGKey(6), (5, 5))
    params = {"l": {"w": w}}
    u0 = sn.sn_init(jax.random.PRNGKey(7), params)
    for _ in range(100):  # converge u so sigma is accurate
        _, u0 = sn.sn_normalize(params, u0, update=True)

    def f(w):
        p_sn, _ = sn.sn_normalize({"l": {"w": w}}, u0, update=False)
        return jnp.sum(p_sn["l"]["w"] ** 2)

    g = jax.grad(f)(w)
    sigma, _ = sn.sigma_and_update(w, u0["l/w"])
    g_const_sigma = 2.0 * w / sigma**2
    assert not np.allclose(np.asarray(g), np.asarray(g_const_sigma), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(g)))


def test_sn_sigmas_accuracy_and_no_update():
    """sn_sigmas reports the converged power-iteration σ (vs numpy SVD)
    without advancing u."""
    import numpy as np

    from dvdgan_tpu.ops import spectral_norm as sn

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(24, 6).astype(np.float32))
    params = {"lin": {"w": w}}
    u = sn.sn_init(jax.random.PRNGKey(1), params)
    for _ in range(30):                      # converge the persistent u
        _, u = sn.sn_normalize(params, u, update=True)
    sig = sn.sn_sigmas(params, u)
    true = float(np.linalg.svd(np.asarray(w), compute_uv=False)[0])
    assert abs(float(sig["lin/w"]) - true) < 1e-3 * true
    sig2 = sn.sn_sigmas(params, u)           # pure read: identical again
    assert float(sig2["lin/w"]) == float(sig["lin/w"])
