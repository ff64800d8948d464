"""Config-merge and rescale helper tests."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from tmat_tpu.core.config import load_tool_config, merge_cli_overrides
from tmat_tpu.ops.rescale import apply_mask, bin_thresh, rescale_intensity


class TestConfigMerge:
    def test_cli_wins_when_set(self):
        config = {"a": 1, "b": 2}
        merged = merge_cli_overrides(config, {"a": 9, "b": None}, ["a", "b"])
        assert merged["a"] == 9  # CLI value overrides
        assert merged["b"] == 2  # None leaves config value

    def test_missing_key_filled_from_cli(self):
        merged = merge_cli_overrides({}, {"a": None, "b": 5}, ["a", "b"])
        assert merged["a"] is None
        assert merged["b"] == 5

    def test_load_tool_config(self, tmp_path):
        cfg = tmp_path / "c.json"
        cfg.write_text(json.dumps({"x": 1}))
        assert load_tool_config(str(cfg), cfg) == {"x": 1}

    def test_load_missing_exits(self, tmp_path):
        with pytest.raises(SystemExit):
            load_tool_config(str(tmp_path / "nope.json"), tmp_path / "nope.json")


class TestRescale:
    def test_rescale_range(self, rng):
        img = rng.rand(8, 8).astype(np.float32) * 50 + 10
        out = np.asarray(rescale_intensity(jnp.asarray(img), (0, 255)))
        assert out.min() == pytest.approx(0.0, abs=1e-4)
        assert out.max() == pytest.approx(255.0, abs=1e-3)

    def test_rescale_constant_image(self):
        img = jnp.full((4, 4), 7.0)
        out = np.asarray(rescale_intensity(img, (0, 1)))
        np.testing.assert_array_equal(out, 0.0)

    def test_rescale_explicit_in_range(self):
        img = jnp.asarray([[0.0, 5.0, 10.0, 20.0]])
        out = np.asarray(rescale_intensity(img, (0, 1), in_range=(0, 10)))
        np.testing.assert_allclose(out, [[0.0, 0.5, 1.0, 1.0]])

    def test_apply_mask_and_bin_thresh(self):
        img = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        mask = jnp.asarray([[0, 1], [1, 0]])
        masked = np.asarray(apply_mask(img, mask))
        np.testing.assert_array_equal(masked, [[0, 2], [3, 0]])
        binned = np.asarray(bin_thresh(img, 255.0, threshold=2.0))
        np.testing.assert_array_equal(binned, [[0, 0], [255, 255]])
