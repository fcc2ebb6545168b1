"""Round-3 fixes: compile-cache wiring, LazyRows length metadata/memoization,
ctc_backtrack guard, VAD auto-dispatch plumbing."""

import numpy as np
import pytest


class TestCompileCache:
    def test_default_dir_is_repo_local(self, monkeypatch):
        monkeypatch.delenv("TA_JAX_CACHE_DIR", raising=False)
        from tiny_audio_tpu.utils.compile_cache import default_cache_dir

        d = default_cache_dir()
        assert d is not None and d.endswith(".jax_cache")

    def test_env_override_and_disable(self, monkeypatch, tmp_path):
        from tiny_audio_tpu.utils import compile_cache

        monkeypatch.setenv("TA_JAX_CACHE_DIR", str(tmp_path / "c"))
        assert compile_cache.default_cache_dir() == str(tmp_path / "c")
        monkeypatch.setenv("TA_JAX_CACHE_DIR", "off")
        assert compile_cache.default_cache_dir() is None

    def test_enable_sets_jax_config(self, tmp_path):
        import jax

        from tiny_audio_tpu.utils.compile_cache import (
            enable_persistent_compile_cache,
        )

        target = tmp_path / "cache"
        got = enable_persistent_compile_cache(str(target))
        assert got == str(target)
        assert target.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(target)


class TestLazyRowsLengths:
    def _rows(self):
        from tiny_audio_tpu.train.data import LazyRows

        items = [
            ("row", {"audio": {"array": np.zeros(1000 + 100 * i, np.float32)},
                     "text": f"t{i}"})
            for i in range(6)
        ]
        return LazyRows(items)

    def test_len_cache_survives_slicing(self):
        rows = self._rows()
        for i in range(6):
            rows.audio_len(i)
        sliced = rows[1:5]
        # memo carried through: slicing remaps cached lengths
        assert sliced._len_cache == {j: 1000 + 100 * (j + 1) for j in range(4)}
        assert sliced.audio_len(0) == 1100

    def test_len_cache_survives_step_slicing(self):
        rows = self._rows()
        for i in range(6):
            rows.audio_len(i)
        sliced = rows[::2]
        assert sliced.audio_len(2) == 1400
        assert sliced._len_cache[2] == 1400

    def test_duration_metadata_avoids_decode(self):
        """HF-backed rows with a duration column read length WITHOUT
        decoding audio (ADVICE r2: one full decode per clip per epoch)."""
        from tiny_audio_tpu.train.data import DatasetSpec, LazyRows

        decodes = []

        class FakeHFDataset:
            column_names = ["audio", "text", "duration"]
            _rows = [
                {"audio": {"array": np.zeros(32000, np.float32)},
                 "text": "x", "duration": 2.0},
                {"audio": {"array": np.zeros(48000, np.float32)},
                 "text": "y", "duration": 3.0},
            ]

            def __len__(self):
                return len(self._rows)

            def __getitem__(self, i):
                decodes.append(i)
                return self._rows[i]

            def select_columns(self, cols):
                outer = self

                class View:
                    def __getitem__(self, i):
                        return {c: outer._rows[i][c] for c in cols}

                return View()

        spec = DatasetSpec(path="fake", text_column="text")
        ds = FakeHFDataset()
        rows = LazyRows([("hf", (ds, 0, spec)), ("hf", (ds, 1, spec))])
        assert rows.audio_len(0) == 32000
        assert rows.audio_len(1) == 48000
        assert decodes == []  # metadata path: no __getitem__ decode

    def test_num_samples_column(self):
        from tiny_audio_tpu.train.data import DatasetSpec, LazyRows

        class FakeDS:
            column_names = ["audio", "text", "num_samples"]
            _rows = [{"audio": None, "text": "x", "num_samples": 12345}]

            def __getitem__(self, i):
                raise AssertionError("decoded")

            def select_columns(self, cols):
                rows = self._rows

                class View:
                    def __getitem__(self, i):
                        return {c: rows[i][c] for c in cols}

                return View()

        spec = DatasetSpec(path="fake", text_column="text")
        rows = LazyRows([("hf", (FakeDS(), 0, spec))])
        assert rows.audio_len(0) == 12345  # samples, not seconds


class TestCtcBacktrackGuard:
    def test_inconsistent_matrices_raise_descriptive(self):
        from tiny_audio_tpu.ops.ctc import NEG_INF, ctc_backtrack

        t_frames, n_tokens = 6, 3
        trellis = np.zeros((t_frames + 1, n_tokens + 1), np.float32)
        # final state claims reachable, but moved never moves -> token 0
        # gets no frames: must raise a descriptive error, not bare min()
        moved = np.zeros((t_frames, n_tokens + 1), bool)
        with pytest.raises(ValueError, match="inconsistent"):
            ctc_backtrack(trellis, moved, np.array([5, 6, 7]))

    def test_unreachable_final_state_uniform_fallback(self):
        from tiny_audio_tpu.ops.ctc import NEG_INF, ctc_backtrack

        trellis = np.full((7, 4), NEG_INF, np.float32)
        moved = np.zeros((6, 4), bool)
        spans = ctc_backtrack(trellis, moved, np.array([5, 6, 7]))
        assert len(spans) == 3  # uniform spread


class TestVadAutoDispatch:
    def test_fallback_to_heuristic_without_weights(self, monkeypatch):
        import tiny_audio_tpu.vad as vad

        monkeypatch.setattr(vad.NeuralVAD, "_instance", None)
        monkeypatch.setattr(vad.NeuralVAD, "_load_failed", False)
        monkeypatch.setattr(vad, "WEIGHTS_PATH", vad.WEIGHTS_PATH.parent
                            / "definitely_missing.msgpack")
        rng = np.random.default_rng(0)
        audio = (0.1 * rng.standard_normal(16000)).astype(np.float32)
        decisions, trained = vad.frame_vad_auto(audio)
        assert not trained
        assert decisions.dtype == bool
        assert len(decisions) == 16000 // vad.HOP

    def test_neural_path_when_weights_exist(self, tmp_path, monkeypatch):
        """Random weights through the real save/load cycle: decisions flow
        end-to-end and the trained flag is set."""
        import jax
        import jax.numpy as jnp
        from flax import serialization

        import tiny_audio_tpu.vad as vad

        net = vad.build_vadnet()
        params = net.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, vad.N_MELS), jnp.float32)
        )["params"]
        wpath = tmp_path / "w.msgpack"
        wpath.write_bytes(serialization.to_bytes(jax.device_get(params)))

        monkeypatch.setattr(vad.NeuralVAD, "_instance", None)
        monkeypatch.setattr(vad.NeuralVAD, "_load_failed", False)
        monkeypatch.setattr(vad, "WEIGHTS_PATH", wpath)
        rng = np.random.default_rng(0)
        audio = (0.1 * rng.standard_normal(32000)).astype(np.float32)
        decisions, trained = vad.frame_vad_auto(audio)
        assert trained
        assert len(decisions) == 32000 // vad.HOP

    def test_probs_are_chunk_consistent(self, tmp_path, monkeypatch):
        """Long-clip tiling agrees with the bucketed path where contexts
        overlap (same weights, deterministic)."""
        import jax
        import jax.numpy as jnp

        import tiny_audio_tpu.vad as vad

        net = vad.build_vadnet()
        params = net.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 8, vad.N_MELS), jnp.float32)
        )["params"]
        model = vad.NeuralVAD(jax.device_get(params))
        rng = np.random.default_rng(3)
        audio = (0.05 * rng.standard_normal(vad.HOP * 300)).astype(np.float32)
        p1 = model.frame_probs(audio)
        p2 = model.frame_probs(audio)
        assert p1.shape == (300,)
        np.testing.assert_allclose(p1, p2)
