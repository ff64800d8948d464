"""configure() create / relocate semantics (reference configure.py:33-137)."""

import configparser

import pytest

from tmat_tpu import configure as cfg_mod
from tmat_tpu.core import defs


@pytest.fixture
def isolated(tmp_path, monkeypatch):
    """Point package.cfg and defaults into tmp so the source tree and the
    user's real base dir are never touched."""
    monkeypatch.setattr(defs, "PKG_CFG_PATH", tmp_path / "package.cfg")
    monkeypatch.setattr(defs, "BASE_DIR", tmp_path / "default_base")
    return tmp_path


def _recorded(tmp_path):
    parser = configparser.ConfigParser()
    parser.read(tmp_path / "package.cfg")
    return parser[defs.PKG_NAME]["base_dir"]


def test_configure_creates_fresh_base(isolated):
    target = isolated / "base_a"
    out = cfg_mod.configure(str(target))
    assert out == target
    assert (target / "config").is_dir()
    assert (target / "model_training").is_dir()
    assert (target / "output").is_dir()
    assert _recorded(isolated).endswith(str(target.name))


def test_reconfigure_moves_existing_base(isolated):
    """A recorded base dir RELOCATES to the new target with its user
    artifacts (reference configure.py:49-56 move branch)."""
    old = cfg_mod.configure(str(isolated / "base_a"))
    marker = old / "model_training" / "user_artifact.txt"
    marker.write_text("keep me")

    new = cfg_mod.configure(str(isolated / "base_b"))
    assert not old.exists(), "old base dir should have been moved"
    assert (new / "model_training" / "user_artifact.txt").read_text() == "keep me"
    assert _recorded(isolated).endswith("base_b")


def test_reconfigure_existing_target_writes_in_place(isolated):
    old = cfg_mod.configure(str(isolated / "base_a"))
    new_target = isolated / "base_b"
    new_target.mkdir()
    cfg_mod.configure(str(new_target))
    # target existed -> no move; old dir left intact
    assert old.exists()
    assert (new_target / "config").is_dir()


def test_unrecorded_env_dir_is_never_moved(isolated, monkeypatch):
    """An env-pointed BASE_DIR that configure never recorded must not be
    relocated (it could be a source checkout)."""
    env_dir = isolated / "precious_checkout"
    env_dir.mkdir()
    (env_dir / "important.py").write_text("x = 1")
    monkeypatch.setattr(defs, "BASE_DIR", env_dir)

    cfg_mod.configure(str(isolated / "base_new"))
    assert env_dir.exists()
    assert (env_dir / "important.py").is_file()


def test_missing_parent_exits(isolated):
    with pytest.raises(SystemExit):
        cfg_mod.configure(str(isolated / "no" / "such" / "parent" / "base"))


def test_env_override_auto_configure_not_persisted(isolated, monkeypatch):
    """Auto-configure under a TMAT_TPU_BASE_DIR session override must
    materialise the dirs but NOT record the (possibly ephemeral) path in
    package.cfg: a later process without the env var would inherit a
    deleted temp dir as its base — observed as AOT/compile caches landing
    in a pruned pytest tmpdir (round 4b)."""
    env_dir = isolated / "session_base"
    monkeypatch.setenv("TMAT_TPU_BASE_DIR", str(env_dir))
    monkeypatch.setattr(defs, "BASE_DIR", env_dir)

    out = cfg_mod.configure()  # the cli.py auto-configure call shape
    assert out == env_dir
    assert (env_dir / "config").is_dir()
    assert (env_dir / "model_training").is_dir()
    assert not (isolated / "package.cfg").exists(), (
        "env-derived base dirs must not be persisted into the package tree"
    )

    # an explicit configure still records its target
    target = isolated / "chosen_base"
    cfg_mod.configure(str(target))
    assert _recorded(isolated).endswith("chosen_base")


def test_env_override_never_relocates_recorded_base(isolated, monkeypatch):
    """Auto-configure under TMAT_TPU_BASE_DIR pointing at a NOT-yet-existing
    path, with a pre-existing package.cfg, must not fire the create-or-move
    branch: relocating the recorded base dir (user models/configs/outputs)
    into an ephemeral session dir — while deliberately not updating
    package.cfg — would strand the artifacts in a prunable temp dir with the
    recorded pointer dangling (round-4 advisor, medium)."""
    recorded = cfg_mod.configure(str(isolated / "real_base"))
    marker = recorded / "model_training" / "user_artifact.txt"
    marker.write_text("keep me")

    env_dir = isolated / "ephemeral" / "session_base"
    env_dir.parent.mkdir()
    monkeypatch.setenv("TMAT_TPU_BASE_DIR", str(env_dir))
    monkeypatch.setattr(defs, "BASE_DIR", env_dir)

    out = cfg_mod.configure()  # cli.py auto-configure shape
    assert out == env_dir
    assert (env_dir / "config").is_dir(), "override dir must be materialised"
    # the recorded base dir stays put, artifacts intact, pointer valid
    assert recorded.is_dir()
    assert marker.read_text() == "keep me"
    assert _recorded(isolated).endswith("real_base")
