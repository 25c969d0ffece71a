"""Output parity against the actual reference implementation.

Runs the real ychalier/transflow package (mounted read-only at
/root/reference) on the same inputs and compares rendered frames:

* archive (.flow.zip) flow + still pixmap, reset off -> the whole path is
  integer/deterministic, outputs must match EXACTLY;
* Farneback estimation -> >= 40 dB PSNR (BASELINE.md fidelity target); the
  estimators are independent implementations of the same algorithm.

Skipped automatically when the reference mount is absent.
"""
import json
import os
import sys
import zipfile

import cv2
import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "transflow")),
    reason="reference package not mounted")


@pytest.fixture(scope="module")
def reference():
    sys.path.insert(0, REFERENCE_ROOT)
    import transflow.pipeline  # noqa: F401
    yield
    sys.path.remove(REFERENCE_ROOT)


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity")
    rng = np.random.default_rng(3)
    video = str(root / "flow.avi")
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                             (96, 64))
    base = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    base = cv2.GaussianBlur(base, (5, 5), 0)
    for t in range(8):
        frame = np.roll(base, shift=2 * t, axis=1)
        frame = np.roll(frame, shift=t, axis=0)
        writer.write(frame)
    writer.release()
    pix = str(root / "pix.png")
    import PIL.Image
    PIL.Image.fromarray(
        rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)).save(pix)
    # synthetic flow archive (exact replay for both implementations)
    archive = str(root / "flow.flow.zip")
    import io
    with zipfile.ZipFile(archive, "w") as z:
        z.writestr("meta.json", json.dumps(
            {"direction": 1, "width": 96, "height": 64, "framerate": 10.0}))
        jj = np.arange(96)[None, :] * np.ones((64, 1))
        ii = np.arange(64)[:, None] * np.ones((1, 96))
        for index in range(6):
            fx = np.clip(np.round(3 * np.sin(ii / 9 + index)), -jj,
                         95 - jj)
            fy = np.clip(np.round(2 * np.cos(jj / 7 - index)), -ii,
                         63 - ii)
            flow = np.stack([fx, fy], -1).astype(np.float32)
            buffer = io.BytesIO()
            np.save(buffer, flow)
            z.writestr(f"{index:09d}.npy", buffer.getvalue())
    return {"video": video, "pix": pix, "archive": archive, "root": root}


def run_reference(assets, flow_path, out_dir, **cfg_kwargs):
    from transflow.config import Config as RefConfig
    from transflow.config import PixmapSourceConfig as RefPixmapConfig
    from transflow.pipeline import Pipeline as RefPipeline
    out = str(out_dir / "ref-%03d.png")
    cfg = RefConfig(
        flow_path,
        pixmap_sources=[RefPixmapConfig(assets["pix"])],
        output_path=out,
        seed=5,
        **cfg_kwargs)
    RefPipeline(cfg, execute=False, replace=True,
                export_config=False).run()
    return sorted(out_dir.glob("ref-*.png"))


def run_ours(assets, flow_path, out_dir, **cfg_kwargs):
    from transflow_tpu.config import Config, PixmapSourceConfig
    from transflow_tpu.pipeline import Pipeline
    out = str(out_dir / "own-%03d.png")
    cfg = Config(
        flow_path,
        pixmap_sources=[PixmapSourceConfig(assets["pix"])],
        output_path=out,
        seed=5,
        **cfg_kwargs)
    Pipeline(cfg, execute=False, replace=True, export_config=False,
             progress=False).run()
    return sorted(out_dir.glob("own-*.png"))


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10 * np.log10(255.0 ** 2 / mse)


class TestArchiveExact:

    def test_bit_exact(self, reference, assets, tmp_path):
        ref_frames = run_reference(assets, assets["archive"], tmp_path)
        own_frames = run_ours(assets, assets["archive"], tmp_path)
        assert len(ref_frames) == len(own_frames) > 0
        for ref_path, own_path in zip(ref_frames, own_frames):
            ref = cv2.imread(str(ref_path))
            own = cv2.imread(str(own_path))
            diff = np.abs(ref.astype(int) - own.astype(int))
            assert diff.max() == 0, (
                f"{ref_path.name}: max diff {diff.max()} "
                f"({np.count_nonzero(diff.sum(-1))} px)")


class TestFarnebackPSNR:

    def test_psnr_target(self, reference, assets, tmp_path):
        ref_frames = run_reference(assets, assets["video"], tmp_path,
                                   direction="backward")
        own_frames = run_ours(assets, assets["video"], tmp_path,
                              direction="backward")
        assert len(ref_frames) == len(own_frames) > 0
        values = []
        for ref_path, own_path in zip(ref_frames, own_frames):
            ref = cv2.imread(str(ref_path))
            own = cv2.imread(str(own_path))
            values.append(psnr(ref, own))
        mean_psnr = float(np.mean(values))
        # BASELINE.md fidelity target: >= 40 dB against the reference
        assert mean_psnr >= 40.0, f"PSNR {values}"


class TestHornSchunckPSNR:

    def test_psnr_target(self, reference, assets, tmp_path):
        import json as _json
        cv_cfg = str(assets["root"] / "hs.json")
        with open(cv_cfg, "w") as file:
            _json.dump({"method": "horn-schunck", "hs_iterations": 3,
                        "hs_alpha": 1.0, "hs_decay": 0.0, "hs_delta": 1.0},
                       file)
        ref_frames = run_reference(assets, assets["video"], tmp_path,
                                   direction="backward", cv_config=cv_cfg)
        own_frames = run_ours(assets, assets["video"], tmp_path,
                              direction="backward", cv_config=cv_cfg)
        assert len(ref_frames) == len(own_frames) > 0
        values = [psnr(cv2.imread(str(a)), cv2.imread(str(b)))
                  for a, b in zip(ref_frames, own_frames)]
        assert float(np.mean(values)) >= 40.0, values


class TestTransformedArchiveExact:
    """Multi-flow merge through both full pipelines — exact; plus evidence
    for a latent reference bug found while building this test:
    ArchiveFlowSource.Builder never calls super().build()
    (/root/reference/transflow/flow/sources/archive.py:23-31), so the
    reference silently IGNORES --filters/--mask (and seek/duration/repeat)
    on .flow.zip inputs. Exact filtered-archive parity is therefore
    impossible by definition; the filter/mask functions themselves are
    proven exact in test_reference_parity_units.py."""

    def _second_archive(self, assets):
        import io
        import json as _json
        path = str(assets["root"] / "flow2.flow.zip")
        if os.path.exists(path):
            return path
        with zipfile.ZipFile(path, "w") as z:
            z.writestr("meta.json", _json.dumps(
                {"direction": 1, "width": 96, "height": 64,
                 "framerate": 10.0}))
            jj = np.arange(96)[None, :] * np.ones((64, 1))
            ii = np.arange(64)[:, None] * np.ones((1, 96))
            for index in range(6):
                # interior-only +-1 displacements: the SUM of both archives
                # must stay in frame bounds — the reference's movement step
                # indexes mask.flat[shift] unclipped (movement.py:39) and
                # CRASHES on out-of-bounds merged flows (ours clips; another
                # latent reference bug found while building this test)
                interior = ((ii >= 16) & (ii < 48)
                            & (jj >= 16) & (jj < 80))
                fx = np.where(interior, np.round(np.cos(ii / 5 - index)),
                              0.0)
                fy = np.where(interior, np.round(np.sin(jj / 8 + index)),
                              0.0)
                flow = np.stack([fx, fy], -1).astype(np.float32)
                buffer = io.BytesIO()
                np.save(buffer, flow)
                z.writestr(f"{index:09d}.npy", buffer.getvalue())
        return path

    def test_merge_exact(self, reference, assets, tmp_path):
        """Two archive flows, sum-merged: bit-exact through both pipelines."""
        second = self._second_archive(assets)
        kwargs = dict(extra_flow_paths=[second],
                      flows_merging_function="sum")
        ref_frames = run_reference(assets, assets["archive"], tmp_path,
                                   **kwargs)
        own_frames = run_ours(assets, assets["archive"], tmp_path, **kwargs)
        assert len(ref_frames) == len(own_frames) > 0
        for ref_path, own_path in zip(ref_frames, own_frames):
            diff = np.abs(cv2.imread(str(ref_path)).astype(int)
                          - cv2.imread(str(own_path)).astype(int))
            assert diff.max() == 0, ref_path.name

    def test_reference_ignores_archive_filters_we_apply_them(
            self, reference, assets, tmp_path):
        """Bug evidence: the reference's filtered archive render equals its
        unfiltered one; ours actually applies the filter."""
        plain_dir = tmp_path / "plain"; plain_dir.mkdir()
        filt_dir = tmp_path / "filt"; filt_dir.mkdir()
        ref_plain = run_reference(assets, assets["archive"], plain_dir)
        ref_filt = run_reference(assets, assets["archive"], filt_dir,
                                 flow_filters="threshold=1.5")
        for a, b in zip(ref_plain, ref_filt):
            assert np.array_equal(cv2.imread(str(a)), cv2.imread(str(b))), \
                "reference started honoring archive filters — revisit!"
        own_plain_dir = tmp_path / "oplain"; own_plain_dir.mkdir()
        own_filt_dir = tmp_path / "ofilt"; own_filt_dir.mkdir()
        own_plain = run_ours(assets, assets["archive"], own_plain_dir)
        own_filt = run_ours(assets, assets["archive"], own_filt_dir,
                            flow_filters="threshold=1.5")
        assert any(not np.array_equal(cv2.imread(str(a)), cv2.imread(str(b)))
                   for a, b in zip(own_plain, own_filt)), \
            "our archive filter had no effect"
