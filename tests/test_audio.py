"""Audio decode (io/audio.py) and the GEM dataset's with_audio path.

The native ffmpeg shim and the pure-Python PCM twin must agree byte-for-
byte on PCM fixtures (the repo's native-code convention); the dataset must
return left/right/front mono audio split to the AUDIO_FPS frame counts
(reference io/dataset.py:275,1370-1393,2128-2278).
"""

import numpy as np
import pytest

from gem_fixture import (
    VIDEO_FPS,
    audio_tone,
    build_gem_fixture,
    inject_pcm_audio_track,
    write_video,
)
from routeformer_tpu.io.audio import read_audio

RATE = 48000


@pytest.fixture(scope="module")
def audio_mp4(tmp_path_factory):
    path = tmp_path_factory.mktemp("aud") / "clip.mp4"
    write_video(path, int(6 * VIDEO_FPS))
    pcm = audio_tone(6.0, RATE, seed=5)
    inject_pcm_audio_track(path, pcm, RATE)
    return path, pcm


class TestReadAudio:
    def test_native_pure_byte_parity(self, audio_mp4):
        path, _ = audio_mp4
        for window in [(0.0, float("inf")), (1.0, 3.0), (2.5, 4.25), (0.0, 0.5)]:
            nat = read_audio(path, *window)
            pure = read_audio(path, *window, force_pure=True)
            assert nat["sample_rate"] == pure["sample_rate"] == RATE
            np.testing.assert_array_equal(
                nat["audio"], pure["audio"], err_msg=str(window)
            )

    def test_mono_is_channel_mean_at_native_scale(self, audio_mp4):
        """The reference averages channels WITHOUT rescaling
        (np.concatenate(..., dtype=float32).mean(0) of int16 PCM keeps the
        integer scale, dataset.py:2184-2186)."""
        path, pcm = audio_mp4
        full = read_audio(path)["audio"]
        assert full.shape == (pcm.shape[0], 1) and full.dtype == np.float32
        np.testing.assert_allclose(
            full[:, 0], pcm.astype(np.float32).mean(axis=1), atol=1e-3
        )

    def test_window_includes_preceding_frame(self, audio_mp4):
        """An off-packet start prepends the last preceding packet
        (reference :2362-2369) — so the window's first sample time is at
        or before the requested start."""
        path, _ = audio_mp4
        start, end = 2.0, 4.0
        got = read_audio(path, start, end)["audio"]
        n_expected = (end - start) * RATE
        assert n_expected <= got.shape[0] <= n_expected + 3 * 1024

    def test_missing_audio_track_degrades(self, tmp_path):
        path = tmp_path / "noaudio.mp4"
        write_video(path, 10)
        out = read_audio(path)
        assert out["audio"].shape == (0, 0)
        out = read_audio(path, force_pure=True)
        assert out["audio"].shape == (0, 0)

    def test_missing_file_degrades(self, tmp_path):
        out = read_audio(tmp_path / "nope.mp4")
        assert out["audio"].shape == (0, 0)


class TestDatasetWithAudio:
    @pytest.fixture(scope="class")
    def gem_audio_root(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("gem_audio")
        build_gem_fixture(root, duration_s=20.0, with_audio=True)
        return root

    def _dataset(self, root, **kwargs):
        from routeformer_tpu.io.dataset import GEMDataset

        defaults = dict(
            root=root, split=["001"], input_length=8, target_length=6,
            step_size=2, min_pci=None, output_fps=5, crop_videos=True,
            undistort_videos=False, gopro_scaling_factor=0.5,
            front_scaling_factor=0.5, with_video=True, with_gaze=True,
            with_audio=True,
        )
        defaults.update(kwargs)
        return GEMDataset(**defaults)

    def test_sample_has_three_audio_streams(self, gem_audio_root):
        ds = self._dataset(gem_audio_root)
        sample = ds[0]
        for phase, count in (
            ("train", ds.input_audio_frame_count),
            ("target", ds.target_audio_frame_count),
        ):
            for key in ("left_audio", "right_audio", "front_audio"):
                arr = sample[phase][key]
                assert arr.shape == (count, 1), (phase, key, arr.shape)
                assert arr.dtype == np.float32
                assert float(np.abs(arr).max()) > 0  # real signal decoded

    def test_audio_content_matches_direct_decode(self, gem_audio_root):
        """The sample's left_audio is a prefix-aligned slice of the direct
        read_audio window over the same recording span."""
        ds = self._dataset(gem_audio_root)
        sample, item = ds.get_with_info(0)
        meta = item["trajectory_metadata"]
        start = item["sample_start_time"] + meta["left_offset"]
        end = (
            item["sample_start_time"] + ds.input_length + ds.target_length
            + 1 / ds.VIDEO_FPS + meta["left_offset"]
        )
        direct = read_audio(item["left"], start, end)["audio"]
        n_train = ds.input_audio_frame_count
        np.testing.assert_array_equal(
            sample["train"]["left_audio"], direct[:n_train]
        )
        np.testing.assert_array_equal(
            sample["target"]["left_audio"],
            direct[n_train : n_train + ds.target_audio_frame_count],
        )

    def test_audio_roundtrips_sample_cache(self, gem_audio_root, tmp_path):
        ds = self._dataset(gem_audio_root, use_cache=True, cache_dir=tmp_path)
        first = ds[0]
        ds._sample_cache.flush()
        ds2 = self._dataset(gem_audio_root, use_cache=True, cache_dir=tmp_path)
        cached = ds2[0]
        np.testing.assert_array_equal(
            first["train"]["left_audio"], cached["train"]["left_audio"]
        )

    def test_without_audio_has_no_audio_keys(self, gem_audio_root):
        ds = self._dataset(gem_audio_root, with_audio=False)
        sample = ds[0]
        assert not any("audio" in k for k in sample["train"])


class TestAACWindowSemantics:
    """Compressed-audio coverage. Real recordings carry AAC, but the pure
    twin is PCM-only (an AAC decoder has no reasonable pure-Python twin),
    so the native decoder's window/prepend/drain semantics are asserted by
    SELF-CONSISTENCY on a byte-real AAC fixture: every window read must be
    an exact contiguous slice of the full-file decode (same decoder, so
    sample values are bit-identical), covering [start, end], and a window
    reaching EOF must include the decoder's drained trailing frames."""

    @pytest.fixture(scope="class")
    def aac_mp4(self, tmp_path_factory):
        from routeformer_tpu.io.audio import encode_aac

        path = tmp_path_factory.mktemp("aac") / "clip.mp4"
        tone = audio_tone(4.0, RATE, seed=7)[:, 0].astype(np.float32)
        tone /= max(1.0, np.abs(tone).max())  # mono in [-1, 1]
        if not encode_aac(path, tone, RATE):
            pytest.skip("native audio library with AAC encoder unavailable")
        return path

    def test_full_decode_shape(self, aac_mp4):
        out = read_audio(aac_mp4)
        assert out["sample_rate"] == RATE
        assert out["audio"].ndim == 2 and out["audio"].shape[1] == 1
        # within one codec frame of the 4 s source (priming/padding)
        assert abs(out["audio"].shape[0] - 4 * RATE) <= 2048

    def test_window_is_exact_slice_of_full(self, aac_mp4):
        """Every windowed read aligns to the full decode and matches it
        BITWISE from the second decoded frame on. The first frame after a
        seek legitimately differs: the AAC decoder is missing the previous
        frame's MDCT overlap (the reference's PyAV seek path behaves the
        same way), so the head is excluded from the bitwise claim."""
        full = read_audio(aac_mp4)["audio"][:, 0]
        for a, b in [(0.5, 1.25), (2.37, 3.11), (0.0, 0.25)]:
            win = read_audio(aac_mp4, a, b)["audio"][:, 0]
            assert win.size >= (b - a) * RATE, (a, b, win.size)
            # align on the window's tail: decoder state converges after
            # the seek, so trailing samples are bit-identical
            probe_at = win.size - 4096
            off = full.tobytes().find(win[probe_at:].tobytes())
            assert off >= 0 and off % 4 == 0, (a, b, off)
            idx = off // 4 - probe_at
            d = np.abs(full[idx : idx + win.size] - win)
            # second half bit-exact; head within decoder-reconvergence
            # error except the overlap-damaged first frame
            assert d[win.size // 2 :].max() == 0.0, (a, b)
            assert d[1024:].max() <= 0.05, (a, b, float(d[1024:].max()))
            # covers [a, b]: starts at/before a (preceding-frame rule,
            # +1 sample slack for the ceil'd pts bound), ends at/after b
            assert idx <= a * RATE + 1, (a, idx)
            assert idx + win.size >= min(b * RATE, full.size), (b, idx)

    def test_zero_length_window_serves_preceding_frame(self, aac_mp4):
        win = read_audio(aac_mp4, 1.0, 1.0)["audio"]
        assert win.shape[0] >= 1 and win.shape[1] == 1

    def test_window_reaching_eof_includes_drained_frames(self, aac_mp4):
        """AAC has decoder delay: the trailing frames of a window that
        reaches the file's end only surface on the NULL flush packet. A
        drain that discards them (the old behavior) truncates the tail."""
        full = read_audio(aac_mp4)["audio"][:, 0]
        win = read_audio(aac_mp4, 3.9, float("inf"))["audio"][:, 0]
        assert win.size > 0
        assert np.array_equal(win[-1024:], full[-1024:])
        assert win.size >= full.size - int(3.9 * RATE) - 1024
