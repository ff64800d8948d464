"""GP-EI Bayesian optimizer (models/bo.py) unit + behavior tests."""

import math

import numpy as np
import pytest

from tmat_tpu.models import bo

SPACE = {
    "adam_beta_1_range": [0.5, 0.95],
    "adam_beta_2_range": [0.9, 0.9999],
    "frozen_lr_range": [1e-5, 1e-2],
    "fine_tune_lr_range": [1e-6, 1e-3],
    "last_layer_options": ["a", "b", "c", "d"],
}


def test_hpspace_roundtrip():
    sp = bo.HPSpace(SPACE)
    rng = np.random.RandomState(0)
    for _ in range(50):
        hp = sp.decode(sp.sample(rng))
        # bounds respected
        assert 0.5 <= hp["adam_beta_1"] <= 0.95
        assert 1e-6 <= hp["fine_tune_lr"] <= 1e-3
        assert hp["last_resnet_layer"] in SPACE["last_layer_options"]
        # encode(decode(u)) decodes to the same hp
        hp2 = sp.decode(sp.encode(hp))
        assert hp2["last_resnet_layer"] == hp["last_resnet_layer"]
        for k in ("adam_beta_1", "adam_beta_2", "frozen_lr", "fine_tune_lr"):
            assert hp2[k] == pytest.approx(hp[k], rel=1e-9)


def test_gp_interpolates_and_uncertainty_grows():
    rng = np.random.RandomState(1)
    X = rng.rand(20, 3)
    y = np.sin(3 * X[:, 0]) + X[:, 1] ** 2
    gp = bo.GP(X, y)
    mu, sigma = gp.predict(X)
    np.testing.assert_allclose(mu, y, atol=0.15)
    # far from data: predictive sd larger than at the data
    far = np.full((1, 3), 5.0)
    _, sigma_far = gp.predict(far)
    assert sigma_far[0] > sigma.mean()


def test_expected_improvement_semantics():
    mu = np.array([0.0, 1.0])
    sigma = np.array([0.1, 0.1])
    ei = bo.expected_improvement(mu, sigma, best=0.5)
    assert ei[0] > ei[1]  # lower predicted mean -> more improvement
    assert np.all(ei >= 0)
    # zero uncertainty and worse mean -> zero EI
    ei0 = bo.expected_improvement(np.array([1.0]), np.array([1e-15]), best=0.5)
    assert ei0[0] == pytest.approx(0.0, abs=1e-12)


def test_bo_beats_random_on_smooth_landscape():
    """Deterministic seeded comparison on a quadratic log-space bowl —
    the benchmark's (benchmarks/hp_search_benchmark.py) smallest case."""

    def objective(hp):
        loss = {"a": 0.3, "b": 0.1, "c": 0.5, "d": 0.4}[hp["last_resnet_layer"]]
        loss += 0.05 * (math.log(hp["fine_tune_lr"]) - math.log(3e-5)) ** 2
        loss += 0.03 * (math.log(hp["frozen_lr"]) - math.log(3e-4)) ** 2
        return loss

    wins = 0
    for seed in range(3):
        _, bo_best = bo.minimize(
            objective, SPACE, trials=30, num_initial_points=10, seed=seed
        )
        sp = bo.HPSpace(SPACE)
        rng = np.random.RandomState(seed)
        rand_best = min(
            objective(sp.decode(sp.sample(rng))) for _ in range(30)
        )
        wins += bo_best <= rand_best
    assert wins >= 2


def test_bo_handles_failed_trials():
    calls = [0]

    def objective(hp):
        calls[0] += 1
        return float("nan") if calls[0] % 3 == 0 else hp["fine_tune_lr"]

    best_hp, best = bo.minimize(objective, SPACE, trials=12, seed=0)
    assert np.isfinite(best)
    assert best_hp is not None


def test_hp_search_method_wiring(monkeypatch, tmp_path):
    """search(method=...) dispatches to the right proposer without
    training (evaluate_hp stubbed)."""
    from tmat_tpu.models import hp_search

    losses = {"bo": [], "random": []}

    def fake_eval(hp, *args, **kwargs):
        return 0.5 + 0.1 * math.log(hp["fine_tune_lr"] / 1e-6) / math.log(1e3)

    monkeypatch.setattr(hp_search, "evaluate_hp", lambda hp, *a, **k: fake_eval(hp))
    for method in ("bo", "random"):
        best_hp, best = hp_search.search(
            {}, {}, trials=6, initial_points=3, space=SPACE,
            verbose=False, method=method,
        )
        assert best_hp is not None and np.isfinite(best)
        losses[method].append(best)
