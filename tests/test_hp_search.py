"""HP search sampling and loop tests (evaluation stubbed for speed)."""

import numpy as np

from tmat_tpu.models import hp_search


SPACE = {
    "adam_beta_1_range": [0.8, 0.99],
    "adam_beta_2_range": [0.98, 0.999],
    "frozen_lr_range": [1e-4, 1e-2],
    "fine_tune_lr_range": [1e-5, 1e-3],
    "last_layer_options": ["conv5_block3_out", "conv4_block6_out"],
    "num_initial_points": 3,
    "max_opt_trials": 6,
}


def test_sample_hp_within_bounds():
    rng = np.random.RandomState(0)
    for _ in range(50):
        hp = hp_search.sample_hp(SPACE, rng)
        assert 0.8 <= hp["adam_beta_1"] <= 0.99
        assert 1e-4 <= hp["frozen_lr"] <= 1e-2
        assert hp["last_resnet_layer"] in SPACE["last_layer_options"]


def test_refinement_narrows_around_incumbent():
    rng = np.random.RandomState(0)
    incumbent = {"adam_beta_1": 0.9, "adam_beta_2": 0.99, "frozen_lr": 1e-3,
                 "fine_tune_lr": 1e-4, "last_resnet_layer": "conv4_block6_out"}
    samples = [
        hp_search.sample_hp(SPACE, rng, incumbent=incumbent, shrink=0.1)["frozen_lr"]
        for _ in range(100)
    ]
    assert max(samples) / min(samples) < np.exp(np.log(100) * 0.15)


def test_search_finds_minimum(monkeypatch):
    # stub the expensive training-based evaluation with a synthetic objective
    def fake_eval(hp, *args, **kwargs):
        return abs(np.log(hp["frozen_lr"]) - np.log(1e-3))

    monkeypatch.setattr(hp_search, "evaluate_hp", fake_eval)
    best_hp, best_loss = hp_search.search(
        {}, {}, trials=30, initial_points=15, space=SPACE, verbose=False
    )
    assert abs(np.log(best_hp["frozen_lr"]) - np.log(1e-3)) < 0.8
    assert best_loss < 0.8
