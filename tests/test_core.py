"""Core-layer tests: z-stack discovery, image I/O round-trips, path plumbing."""

import numpy as np
import pytest
from PIL import Image

from tmat_tpu.core import io as tio
from tmat_tpu.core import zdiscovery as zd


def _touch(path):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(b"x")


class TestZDiscovery:
    def test_sequences_grouped_and_sorted(self, tmp_path):
        for well in ("A01", "B02"):
            for z in (2, 0, 1, 10):
                _touch(tmp_path / f"{well}_z{z:02d}.tif")
        stacks = zd.find_zstack_image_sequences(str(tmp_path))
        assert set(stacks) == {"A01", "B02"}
        zs = [p.split("_z")[-1] for p in stacks["A01"]]
        assert zs == ["00.tif", "01.tif", "02.tif", "10.tif"]

    def test_subdirectory_sequences(self, tmp_path):
        for z in range(3):
            _touch(tmp_path / "wellA" / f"img_z{z}.tif")
            _touch(tmp_path / "wellB" / f"img_z{z}.tif")
        stacks = zd.find_zstack_image_sequences(str(tmp_path))
        assert len(stacks) == 2
        assert all(len(v) == 3 for v in stacks.values())

    def test_inconsistent_numbering_raises(self, tmp_path):
        _touch(tmp_path / "a_z1z2.tif")
        _touch(tmp_path / "a_z3.tif")
        with pytest.raises(zd.ZStackInputError):
            zd.find_zstack_image_sequences(str(tmp_path))

    def test_duplicate_slice_numbers_raise(self, tmp_path):
        _touch(tmp_path / "w" / "a_z1.tif")
        _touch(tmp_path / "w2" / "a_z1.tif")
        # same cleaned id? different dirs produce different ids, so make a
        # true duplicate within one stack id:
        _touch(tmp_path / "a_z1.png")
        _touch(tmp_path / "a_z1.tif")
        with pytest.raises(zd.ZStackInputError):
            zd.find_zstack_image_sequences(str(tmp_path))

    def test_find_zstack_files(self, tmp_path):
        _touch(tmp_path / "stack1.tif")
        _touch(tmp_path / "stack2.tif")
        files = zd.find_zstack_files(str(tmp_path))
        assert set(files) == {"stack1", "stack2"}

    def test_clean_ids_strips_redundant_dir(self):
        # dir name longer than half the basename and fully contained in it
        ids = ["well_A01/well_A01_s", "well_B02/well_B02_s"]
        cleaned = zd.clean_zstack_ids(ids)
        assert cleaned == ["well_A01_s", "well_B02_s"]


class TestImageIO:
    def test_tiff_multipage_roundtrip(self, tmp_path, rng):
        stack = rng.randint(0, 255, size=(5, 16, 18)).astype(np.uint8)
        frames = [Image.fromarray(s) for s in stack]
        path = tmp_path / "stack.tif"
        frames[0].save(path, save_all=True, append_images=frames[1:])
        img, sizes = tio.load_image(str(path))
        np.testing.assert_array_equal(img, stack)
        assert sizes.X is None

    def test_single_page_is_2d(self, tmp_path, rng):
        arr = rng.randint(0, 255, size=(16, 16)).astype(np.uint8)
        path = tmp_path / "img.png"
        Image.fromarray(arr).save(path)
        img, _ = tio.load_image(str(path))
        assert img.ndim == 2
        np.testing.assert_array_equal(img, arr)

    def test_image_sequence_stacking(self, tmp_path, rng):
        paths = []
        slices = []
        for z in range(3):
            arr = rng.randint(0, 255, size=(8, 8)).astype(np.uint8)
            p = tmp_path / f"s_z{z}.png"
            Image.fromarray(arr).save(p)
            paths.append(str(p))
            slices.append(arr)
        img, _ = tio.load_image(paths)
        np.testing.assert_array_equal(img, np.stack(slices))

    def test_imagej_hyperstack_channel_selection(self, tmp_path, rng):
        # 2 channels x 3 z slices, ImageJ page order: z-major, c-minor
        pages = rng.randint(0, 255, size=(6, 8, 8)).astype(np.uint8)
        frames = [Image.fromarray(p) for p in pages]
        desc = "ImageJ=1.53\nimages=6\nchannels=2\nslices=3\nframes=1\n"
        path = tmp_path / "hyper.tif"
        frames[0].save(
            path, save_all=True, append_images=frames[1:], tiffinfo={270: desc}
        )
        with pytest.raises(ValueError):
            tio.load_image(str(path))
        img, _ = tio.load_image(str(path), C=1)
        assert img.shape == (3, 8, 8)
        np.testing.assert_array_equal(img, pages[1::2])

    def test_pixel_size_parsing(self, tmp_path, rng):
        arr = rng.randint(0, 255, size=(8, 8)).astype(np.uint8)
        path = tmp_path / "px.tif"
        desc = "ImageJ=1.53\nunit=um\nspacing=2.5\n"
        Image.fromarray(arr).save(
            path, tiffinfo={270: desc, 282: 2.0, 283: 4.0}, resolution_unit=1
        )
        img, sizes = tio.load_image(str(path))
        assert sizes.X == pytest.approx(0.5)
        assert sizes.Y == pytest.approx(0.25)
        assert sizes.Z == pytest.approx(2.5)

    def test_get_image_dims(self, tmp_path, rng):
        stack = rng.randint(0, 255, size=(4, 8, 9)).astype(np.uint8)
        frames = [Image.fromarray(s) for s in stack]
        path = tmp_path / "dims.tif"
        frames[0].save(path, save_all=True, append_images=frames[1:])
        dims = tio.get_image_dims(str(path))
        assert (dims.T, dims.C, dims.Z, dims.Y, dims.X) == (1, 1, 4, 8, 9)

    def test_probe_image_dims_matches_full_decode(self, tmp_path, rng):
        """Header-only probe must agree with the decoding path on plain
        stacks, hyperstacks, and single images (io.py::probe_image_dims)."""
        cases = []
        stack = rng.randint(0, 255, size=(4, 8, 9)).astype(np.uint8)
        frames = [Image.fromarray(s) for s in stack]
        p1 = tmp_path / "plain.tif"
        frames[0].save(p1, save_all=True, append_images=frames[1:])
        cases.append(p1)

        pages = rng.randint(0, 255, size=(6, 8, 8)).astype(np.uint8)
        frames = [Image.fromarray(x) for x in pages]
        desc = "ImageJ=1.53\nimages=6\nchannels=2\nslices=3\nframes=1\n"
        p2 = tmp_path / "hyper.tif"
        frames[0].save(
            p2, save_all=True, append_images=frames[1:], tiffinfo={270: desc}
        )
        cases.append(p2)

        p3 = tmp_path / "single.png"
        Image.fromarray(stack[0]).save(p3)
        cases.append(p3)

        for path in cases:
            probe = tio.probe_image_dims(str(path))
            full = tio.get_image_dims(str(path))
            assert probe == full, path

        assert tio.probe_image_dims(str(tmp_path / "nope.xyz")) is None

    def test_save_image_float_tiff_roundtrip(self, tmp_path, rng):
        arr = rng.rand(8, 8).astype(np.float32)
        path = tmp_path / "f.tiff"
        tio.save_image(path, arr)
        img, _ = tio.load_image(str(path))
        np.testing.assert_allclose(img, arr, atol=1e-7)

    def test_unique_output_filepath(self, tmp_path):
        p = tmp_path / "out.png"
        assert tio.get_unique_output_filepath(str(p)) == str(p)
        p.write_bytes(b"")
        assert tio.get_unique_output_filepath(str(p)) == str(tmp_path / "out-2.png")

    def test_img_mask_pairing(self, tmp_path):
        for n in ("a", "b"):
            _touch(tmp_path / f"{n}.tif")
            _touch(tmp_path / f"{n}_mask.tif")
        pairs = tio.get_img_mask_paths(str(tmp_path))
        assert len(pairs) == 2
        for img, mask in pairs:
            assert mask.endswith("_mask.tif") and not img.endswith("_mask.tif")

    def test_img_mask_mismatch_raises(self, tmp_path):
        _touch(tmp_path / "a.tif")
        with pytest.raises(ValueError):
            tio.get_img_mask_paths(str(tmp_path))
