"""Head-to-head: GP-EI Bayesian optimization vs quasi-random+refinement.

VERDICT r2 missing #2: the reference tunes the invasion model with
keras-tuner BayesianOptimization (50 trials, 25 initial points); round 2
substituted quasi-random search with local refinement without evidence.
This benchmark compares both proposers on deterministic synthetic
val-loss response surfaces over the REAL search space
(model_training/invasion_depth_hp_space.json): quadratic log-space bowls
per last-layer choice with seeded evaluation noise — the same structure
(smooth + unimodal per category + noisy evals) the real objective has at
short-epoch budgets.

Usage: python benchmarks/hp_search_benchmark.py [--trials 50] [--seeds 10]
Prints a table and the JSON verdict consumed by BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import math
from pathlib import Path

import numpy as np

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tmat_tpu.models import bo  # noqa: E402
from tmat_tpu.models.hp_search import sample_hp  # noqa: E402

SPACE = {
    "adam_beta_1_range": [0.5, 0.95],
    "adam_beta_2_range": [0.9, 0.9999],
    "frozen_lr_range": [1e-5, 1e-2],
    "fine_tune_lr_range": [1e-6, 1e-3],
    "last_layer_options": [
        "conv2_block3_out",
        "conv3_block4_out",
        "conv4_block6_out",
        "conv5_block3_out",
    ],
    "num_initial_points": 25,
    "max_opt_trials": 50,
}


def make_landscape(landscape_seed: int):
    """Deterministic val-loss surface: per-layer quadratic bowl in log-HP
    space + heteroscedastic seeded noise (same eval noise for both
    methods at the same trial index)."""
    rs = np.random.RandomState(landscape_seed)
    layer_base = {
        name: float(b)
        for name, b in zip(
            SPACE["last_layer_options"], 0.15 + 0.2 * rs.rand(4)
        )
    }
    opt_ft = rs.uniform(math.log(1e-5), math.log(3e-4))
    opt_fr = rs.uniform(math.log(5e-5), math.log(3e-3))
    opt_b1 = rs.uniform(math.log(0.6), math.log(0.93))
    curv = 0.02 + 0.05 * rs.rand(3)

    def objective(hp, trial_idx):
        loss = layer_base[hp["last_resnet_layer"]]
        loss += curv[0] * (math.log(hp["fine_tune_lr"]) - opt_ft) ** 2
        loss += curv[1] * (math.log(hp["frozen_lr"]) - opt_fr) ** 2
        loss += curv[2] * (math.log(hp["adam_beta_1"]) - opt_b1) ** 2
        # seeded evaluation noise, identical across methods per trial
        noise = np.random.RandomState(
            (landscape_seed * 1000 + trial_idx) % (2**31)
        ).normal(0, 0.02)
        return loss + noise

    return objective


def run_random(objective, trials, initial_points, seed):
    """The round-2 searcher: quasi-random + local refinement."""
    rng = np.random.RandomState(seed)
    best_hp, best_loss = None, np.inf
    for t in range(trials):
        if t < initial_points or best_hp is None:
            hp = sample_hp(SPACE, rng)
        else:
            hp = sample_hp(SPACE, rng, incumbent=best_hp, shrink=0.3)
        loss = objective(hp, t)
        if loss < best_loss:
            best_hp, best_loss = hp, loss
    return best_loss


def run_bo(objective, trials, initial_points, seed):
    t_box = [0]

    def obj(hp):
        loss = objective(hp, t_box[0])
        t_box[0] += 1
        return loss

    _, best = bo.minimize(
        obj, SPACE, trials, num_initial_points=initial_points, seed=seed
    )
    return best


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trials", type=int, default=50)
    p.add_argument("--initial-points", type=int, default=25)
    p.add_argument("--seeds", type=int, default=10)
    args = p.parse_args()

    rows = []
    for landscape in range(args.seeds):
        objective = make_landscape(landscape)
        r = run_random(objective, args.trials, args.initial_points, seed=landscape)
        b = run_bo(objective, args.trials, args.initial_points, seed=landscape)
        rows.append((landscape, r, b))
        print(f"landscape {landscape}: random {r:.4f}  bo {b:.4f}  "
              f"{'BO' if b < r else 'random'} wins")

    rand_mean = float(np.mean([r for _, r, _ in rows]))
    bo_mean = float(np.mean([b for _, _, b in rows]))
    bo_wins = int(sum(b < r for _, r, b in rows))
    verdict = {
        "trials": args.trials,
        "initial_points": args.initial_points,
        "landscapes": args.seeds,
        "random_mean_best": round(rand_mean, 5),
        "bo_mean_best": round(bo_mean, 5),
        "bo_wins": bo_wins,
        "winner": "bo" if bo_mean < rand_mean else "random",
    }
    print(json.dumps(verdict))


if __name__ == "__main__":
    main()
