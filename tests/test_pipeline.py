"""End-to-end pipeline tests on synthetic assets.

Mirrors the reference test strategy (reference tests/test_pipeline.py):
basic/advanced renders, checkpoint determinism (resume reproduces the same
frame), config export, view-flow modes, seek behavior.
"""
import json
import os
import zipfile

import cv2
import numpy as np
import PIL.Image
import pytest

from transflow_tpu.config import Config, LayerConfig, PixmapSourceConfig
from transflow_tpu.pipeline import Pipeline

pytestmark = pytest.mark.slow  # heavy e2e/parity file: excluded from the driver-budget quick run (pytest.ini)


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    video = str(root / "video.avi")
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                             (64, 48))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    for t in range(12):
        frame = np.roll(base, shift=2 * t, axis=1)
        frame[20:30, 5 + 3 * t:15 + 3 * t] = (250, 250, 250)
        writer.write(frame)
    writer.release()
    image = str(root / "pix.png")
    PIL.Image.fromarray(
        rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)).save(image)
    return {"root": root, "video": video, "image": image}


def run_pipeline(cfg, **kwargs):
    kwargs.setdefault("progress", False)
    kwargs.setdefault("execute", False)
    pipeline = Pipeline(cfg, **kwargs)
    pipeline.run()
    return pipeline


def read_frames(path):
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    return frames


class TestBasicRender:

    def test_image_pixmap(self, assets, tmp_path):
        out = str(tmp_path / "out.avi")
        cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig(assets["image"])],
                     seed=1)
        pipeline = run_pipeline(cfg, replace=True)
        assert pipeline.cursor == 11  # 12 frames -> 11 flows
        frames = read_frames(out)
        assert len(frames) == 11
        # the video content rolls +2 px/frame: the pixmap must be advected
        # by +2 px at frame 0 (and NOT match the unshifted pixmap)
        pix = np.asarray(PIL.Image.open(assets["image"]))

        def corr(a, b):
            return np.corrcoef(a[:, 8:-8].ravel().astype(float),
                               b[:, 8:-8].ravel().astype(float))[0, 1]

        shifted = corr(frames[0], np.roll(pix, 2, axis=1))
        unshifted = corr(frames[0], pix)
        assert shifted > 0.4, f"advection missing (corr {shifted:.3f})"
        assert shifted > unshifted + 0.3

    def test_advanced(self, assets, tmp_path):
        out = str(tmp_path / "out.avi")
        cfg = Config(
            assets["video"], output_path=out, vcodec="mjpeg",
            direction="forward",
            flow_filters="scale=1.5",
            pixmap_sources=[PixmapSourceConfig("cnoise", layers=[0]),
                            PixmapSourceConfig(assets["image"], layers=[1])],
            layers=[LayerConfig(0, reset_mode="random",
                                reset_random_factor=0.1),
                    LayerConfig(1, classname="introduction",
                                mask_alpha="circle:20")],
            seed=2)
        pipeline = run_pipeline(cfg, replace=True)
        assert pipeline.cursor == 11
        assert len(read_frames(out)) == 11

    def test_duration(self, assets, tmp_path):
        out = str(tmp_path / "out.avi")
        cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                     duration_time=0.5,
                     pixmap_sources=[PixmapSourceConfig("noise")], seed=3)
        pipeline = run_pipeline(cfg, replace=True)
        assert pipeline.cursor == 5
        assert len(read_frames(out)) == 5

    def test_seek_changes_output(self, assets, tmp_path):
        outs = []
        for idx, seek in enumerate([None, 0.4]):
            out = str(tmp_path / f"out{idx}.avi")
            cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                         seek_time=seek, duration_time=0.3,
                         pixmap_sources=[PixmapSourceConfig("noise")], seed=4)
            run_pipeline(cfg, replace=True)
            outs.append(read_frames(out))
        assert not np.array_equal(outs[0][-1], outs[1][-1])

    def test_config_export(self, assets, tmp_path):
        out = str(tmp_path / "out.avi")
        cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig("noise")], seed=5)
        run_pipeline(cfg, replace=True, export_config=True)
        config_path = str(tmp_path / "out.config.json")
        assert os.path.isfile(config_path)
        with open(config_path) as file:
            loaded = json.load(file)
        assert loaded["seed"] == 5


class TestViewFlow:

    def test_view_flow(self, assets, tmp_path):
        out = str(tmp_path / "flow.avi")
        cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                     view_flow=True, render_scale=0.25, seed=6)
        pipeline = run_pipeline(cfg, replace=True)
        assert pipeline.cursor == 11
        assert len(read_frames(out)) == 11

    def test_view_flow_magnitude(self, assets, tmp_path):
        out = str(tmp_path / "mag.avi")
        cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                     view_flow_magnitude=True, render_binary=True, seed=6)
        run_pipeline(cfg, replace=True)
        assert len(read_frames(out)) == 11


class TestFlowExport:

    def test_export_and_replay(self, assets, tmp_path):
        out = str(tmp_path / "out.avi")
        cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig("noise")], seed=7)
        run_pipeline(cfg, replace=True, export_flow=True)
        flow_zip = str(tmp_path / "out.flow.zip")
        assert os.path.isfile(flow_zip)
        with zipfile.ZipFile(flow_zip) as z:
            assert len([n for n in z.namelist()
                        if n.endswith(".npy")]) == 11
        # replay the archive through the pipeline
        out2 = str(tmp_path / "replay.avi")
        cfg2 = Config(flow_zip, output_path=out2, vcodec="mjpeg",
                      pixmap_sources=[PixmapSourceConfig("noise")], seed=7)
        pipeline2 = run_pipeline(cfg2, replace=True)
        assert pipeline2.cursor == 11
        # identical (exported, already post-processed and clipped) flow +
        # same seed: the replay must reproduce the run exactly (the replay's
        # post-process is idempotent: backward direction only re-clips)
        a = read_frames(out)
        b = read_frames(out2)
        assert len(a) == len(b)
        for fa, fb in zip(a, b):
            assert np.array_equal(fa, fb)

    def test_batched_export_matches_per_frame(self, assets, tmp_path):
        """--batch-frames flow export (flows stacked by the scan) must write
        the same archive as the per-frame path."""
        archives = []
        for idx, batch in enumerate([1, 4]):
            out = str(tmp_path / f"fe{idx}.avi")
            cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                         pixmap_sources=[PixmapSourceConfig("noise")],
                         seed=7, batch_frames=batch)
            pipeline = run_pipeline(cfg, replace=True, export_flow=True)
            assert pipeline._batch_size == batch
            archives.append(str(tmp_path / f"fe{idx}.flow.zip"))
        with zipfile.ZipFile(archives[0]) as za, \
                zipfile.ZipFile(archives[1]) as zb:
            names = [n for n in za.namelist() if n.endswith(".npy")]
            assert sorted(names) == sorted(
                n for n in zb.namelist() if n.endswith(".npy"))
            assert len(names) == 11
            for name in names:
                with za.open(name) as fa, zb.open(name) as fb:
                    a = np.load(fa)
                    b = np.load(fb)
                assert np.array_equal(a, b), name

    def test_archive_replay_batched_matches_per_frame(self, assets,
                                                      tmp_path):
        """Flow-yielding sources (archive replay) take the chunked scan
        path (no estimation, engine.device_scan_flows) and must match the
        per-frame path bit-exactly, including the short-chunk tail."""
        out = str(tmp_path / "exp.avi")
        cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig("noise")], seed=9)
        run_pipeline(cfg, replace=True, export_flow=True)
        flow_zip = str(tmp_path / "exp.flow.zip")
        outs = []
        for idx, batch in enumerate([1, 4]):
            out_r = str(tmp_path / f"rp{idx}.avi")
            cfg2 = Config(flow_zip, output_path=out_r, vcodec="mjpeg",
                          pixmap_sources=[PixmapSourceConfig("noise")],
                          seed=9, batch_frames=batch)
            pipeline = run_pipeline(cfg2, replace=True)
            assert pipeline._batch_size == batch
            outs.append(read_frames(out_r))
        assert len(outs[0]) == len(outs[1]) == 11
        for fa, fb in zip(outs[0], outs[1]):
            assert np.array_equal(fa, fb)


class TestCheckpoint:

    def test_resume_determinism(self, assets, tmp_path):
        out = str(tmp_path / "ref.avi")
        template = str(tmp_path / "ref-%03d.png")
        cfg = Config(assets["video"], output_path=[out, template],
                     vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig("cnoise")],
                     layers=[LayerConfig(0, reset_mode="constant",
                                         reset_constant_step=0.5)],
                     seed=8)
        run_pipeline(cfg, replace=True, checkpoint_every=5)
        ckpt = str(tmp_path / "ref_00005.ckpt.zip")
        assert os.path.isfile(ckpt)
        # the resumed run writes to the checkpointed config's outputs —
        # set the originals aside first (like the reference's own test)
        for png in tmp_path.glob("ref-*.png"):
            png.rename(tmp_path / png.name.replace("ref-", "orig-"))
        pipeline2 = run_pipeline(Config(ckpt), replace=True)
        assert pipeline2.cursor >= 1
        resumed = cv2.imread(str(tmp_path / "ref-005.png"))
        original = cv2.imread(str(tmp_path / "orig-005.png"))
        assert original is not None and resumed is not None
        diff = np.abs(resumed.astype(int) - original.astype(int))
        assert diff.max() == 0, f"resume mismatch: max diff {diff.max()}"


class TestBatchedMode:

    def test_batched_matches_per_frame(self, assets, tmp_path):
        """--batch-frames (lax.scan chunks) must reproduce the per-frame
        path exactly."""
        outs = []
        for idx, batch in enumerate([1, 4]):
            out = str(tmp_path / f"b{idx}-%03d.png")
            cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                         pixmap_sources=[PixmapSourceConfig(assets["image"])],
                         seed=12, batch_frames=batch)
            run_pipeline(cfg, replace=True)
            outs.append(sorted(tmp_path.glob(f"b{idx}-*.png")))
        assert len(outs[0]) == len(outs[1]) == 11
        for a, b in zip(*outs):
            fa = cv2.imread(str(a))
            fb = cv2.imread(str(b))
            assert np.array_equal(fa, fb), a.name

    def test_video_pixmap_batched_matches_per_frame(self, assets, tmp_path):
        """The reference's mainline case — ``flow.mp4 -p pixmap.mp4`` with
        a random reset — batches (video frames scan as stacked chunks, the
        RNG key carries through the scan) and is bit-equal to per-frame."""
        outs = []
        for idx, batch in enumerate([1, 4]):
            out = str(tmp_path / f"vp{idx}-%03d.png")
            cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                         pixmap_sources=[PixmapSourceConfig(assets["video"])],
                         layers=[LayerConfig(0, reset_mode="random",
                                             reset_random_factor=0.2)],
                         seed=19, batch_frames=batch)
            pipeline = run_pipeline(cfg, replace=True)
            assert pipeline._batch_size == batch
            outs.append(sorted(tmp_path.glob(f"vp{idx}-*.png")))
        assert len(outs[0]) == len(outs[1]) == 11
        for a, b in zip(*outs):
            fa = cv2.imread(str(a))
            fb = cv2.imread(str(b))
            assert np.array_equal(fa, fb), a.name

    def test_batched_time_expression_matches_per_frame(self, assets,
                                                       tmp_path):
        """t-dependent filters: chunk timestamps are built on the host
        with the per-frame path's float64 arithmetic (f32(t0)+f32(k)/fr
        inside the scan diverged by 1 ULP on ~a quarter of frames —
        review round 3)."""
        outs = []
        for idx, batch in enumerate([1, 4]):
            out = str(tmp_path / f"te{idx}-%03d.png")
            cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                         flow_filters="scale=1 + math.sin(40 * t)",
                         pixmap_sources=[PixmapSourceConfig(assets["image"])],
                         seed=27, batch_frames=batch)
            run_pipeline(cfg, replace=True)
            outs.append(sorted(tmp_path.glob(f"te{idx}-*.png")))
        assert len(outs[0]) == len(outs[1]) == 11
        for a, b in zip(*outs):
            fa = cv2.imread(str(a))
            fb = cv2.imread(str(b))
            assert np.array_equal(fa, fb), a.name

    def test_auto_batching_is_default_for_mainline(self, assets, tmp_path):
        """Without --batch-frames the mainline video-pixmap config takes
        the chunked path (VERDICT r2: the fast path must be on by
        default), while a webcam-style stream or a window output falls
        back to per-frame."""
        out = str(tmp_path / "auto.avi")
        cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig(assets["video"])],
                     seed=20)
        pipeline = run_pipeline(cfg, replace=True)
        assert pipeline._batch_size == Pipeline.AUTO_BATCH
        assert len(read_frames(out)) == 11

    def test_lock_timeline_survives_checkpoint_resume(self, assets,
                                                      tmp_path):
        """Time-positioned locks must not re-fire after a resume: the lock
        timeline t keeps counting across checkpoints (t_base_frames) and
        the input/output alignment is replayed exactly (lock-stay frames
        consume no input). The reference resets its interval cursor while
        t keeps counting, replaying consumed locks after resume
        (source.py:296-310) — a bug documented in docs/DEVIATIONS.md, not
        reproduced. Found by tools/fuzz_chunks.py (round 4)."""
        out = str(tmp_path / "lk.avi")
        template = str(tmp_path / "lk-%03d.png")
        cfg = Config(assets["video"], output_path=[out, template],
                     vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig(assets["image"])],
                     lock_expr="(0.2, 0.3)", lock_mode="stay",
                     seed=31)
        run_pipeline(cfg, replace=True, checkpoint_every=7)
        ckpt = str(tmp_path / "lk_00007.ckpt.zip")
        assert os.path.isfile(ckpt)
        originals = sorted(tmp_path.glob("lk-*.png"))
        assert len(originals) == 14  # 11 flow pairs + 3 locked replays
        for png in originals:
            png.rename(tmp_path / png.name.replace("lk-", "orig-"))
        run_pipeline(Config(ckpt), replace=True)
        resumed = sorted(tmp_path.glob("lk-*.png"))
        assert [p.name.split("-")[1] for p in resumed] == \
            [p.name.split("-")[1] for p in sorted(tmp_path.glob("orig-*.png"))
             if int(p.name.split("-")[1].split(".")[0]) >= 7]
        for png in resumed:
            original = cv2.imread(str(tmp_path /
                                      png.name.replace("lk-", "orig-")))
            got = cv2.imread(str(png))
            assert np.array_equal(got, original), png.name

    def test_batched_random_reset_matches_mid_run_checkpoint(self, assets,
                                                             tmp_path):
        """Checkpoint cadence stays exact under auto-batching (chunks are
        capped at checkpoint boundaries) and the RNG stream carried
        through the scan resumes identically."""
        out = str(tmp_path / "ck.avi")
        template = str(tmp_path / "ck-%03d.png")
        cfg = Config(assets["video"], output_path=[out, template],
                     vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig(assets["video"])],
                     layers=[LayerConfig(0, reset_mode="random",
                                         reset_random_factor=0.15)],
                     seed=23)
        run_pipeline(cfg, replace=True, checkpoint_every=5)
        ckpt = str(tmp_path / "ck_00005.ckpt.zip")
        assert os.path.isfile(ckpt), "chunk alignment lost exact cadence"
        for png in tmp_path.glob("ck-*.png"):
            png.rename(tmp_path / png.name.replace("ck-", "ref-"))
        run_pipeline(Config(ckpt), replace=True)
        resumed = cv2.imread(str(tmp_path / "ck-007.png"))
        original = cv2.imread(str(tmp_path / "ref-007.png"))
        assert original is not None and resumed is not None
        assert np.array_equal(resumed, original)


class TestMeshPipeline:
    """--mesh/--halo from the product surface (VERDICT r2 #5): the CLI
    pipeline spatially sharded over the 8-device CPU mesh must be
    bit-exact vs single-device."""

    def _cfg(self, assets, out, mesh, batch):
        return Config(assets["video"], output_path=out, vcodec="mjpeg",
                      flow_filters="clip=4",
                      pixmap_sources=[PixmapSourceConfig(assets["video"])],
                      layers=[LayerConfig(0, reset_mode="random",
                                          reset_random_factor=0.1)],
                      seed=33, mesh=mesh, batch_frames=batch)

    @pytest.mark.parametrize("batch", [1, None])
    def test_mesh_bit_exact_vs_single_device(self, assets, tmp_path, batch):
        import jax
        assert len(jax.devices()) >= 8
        outs = []
        for idx, mesh in enumerate([None, "1x8"]):
            out = str(tmp_path / f"m{idx}-%03d.png")
            pipeline = run_pipeline(
                self._cfg(assets, out, mesh, batch), replace=True)
            if mesh:
                assert pipeline.engine.mesh is not None
                # halo auto-derived from clip=4 (height_factor 1)
                assert pipeline.engine.halo == 4
            else:
                assert pipeline.engine.mesh is None
            outs.append(sorted(tmp_path.glob(f"m{idx}-*.png")))
        assert len(outs[0]) == len(outs[1]) == 11
        for a, b in zip(*outs):
            fa = cv2.imread(str(a))
            fb = cv2.imread(str(b))
            assert np.array_equal(fa, fb), a.name

    def test_mesh_checkpoint_resume(self, assets, tmp_path):
        """Checkpoints written by a sharded run resume bit-exact (state
        arrays gather to host on save, re-shard on load)."""
        import jax
        assert len(jax.devices()) >= 8
        out = str(tmp_path / "mk.avi")
        template = str(tmp_path / "mk-%03d.png")
        cfg = Config(assets["video"], output_path=[out, template],
                     vcodec="mjpeg", flow_filters="clip=4",
                     pixmap_sources=[PixmapSourceConfig(assets["image"])],
                     layers=[LayerConfig(0, reset_mode="random",
                                         reset_random_factor=0.1)],
                     seed=41, mesh="1x8")
        run_pipeline(cfg, replace=True, checkpoint_every=5)
        ckpt = str(tmp_path / "mk_00005.ckpt.zip")
        assert os.path.isfile(ckpt)
        for png in tmp_path.glob("mk-*.png"):
            png.rename(tmp_path / png.name.replace("mk-", "orig-"))
        run_pipeline(Config(ckpt), replace=True)
        resumed = cv2.imread(str(tmp_path / "mk-007.png"))
        original = cv2.imread(str(tmp_path / "orig-007.png"))
        assert original is not None and resumed is not None
        assert np.array_equal(resumed, original)

    def test_mesh_rejects_bad_specs(self, assets, tmp_path):
        out = str(tmp_path / "bad.avi")
        cfg = self._cfg(assets, out, "2x4", None)
        with pytest.raises(ValueError, match="one\\s+stream"):
            run_pipeline(cfg, replace=True)
        cfg = self._cfg(assets, out, "1x7", None)  # 48 % 7 != 0
        with pytest.raises(ValueError, match="divide"):
            run_pipeline(cfg, replace=True)


class TestLiteFlowNetPipeline:

    def test_liteflownet_batched_matches_per_frame(self, assets, tmp_path,
                                                   monkeypatch):
        """The CNN estimator (RGB frames, weights inlined at trace time)
        must run through both pipeline paths and agree exactly."""
        monkeypatch.setenv("TRANSFLOW_LITEFLOWNET_RANDOM", "1")
        cv_cfg = str(tmp_path / "cv.json")
        with open(cv_cfg, "w") as file:
            json.dump({"method": "liteflownet"}, file)
        outs = []
        for idx, batch in enumerate([1, 4]):
            out = str(tmp_path / f"lfn{idx}-%03d.png")
            cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                         cv_config=cv_cfg,
                         pixmap_sources=[PixmapSourceConfig(assets["image"])],
                         seed=31, batch_frames=batch)
            pipeline = run_pipeline(cfg, replace=True)
            assert pipeline._batch_size == batch
            outs.append(sorted(tmp_path.glob(f"lfn{idx}-*.png")))
        assert len(outs[0]) == len(outs[1]) == 11
        for a, b in zip(*outs):
            fa = cv2.imread(str(a))
            fb = cv2.imread(str(b))
            assert np.array_equal(fa, fb), a.name


class TestLiteFlowNetMeshPipeline:

    def test_mesh_lfn_matches_single_device(self, assets, tmp_path,
                                            monkeypatch):
        """--mesh + liteflownet through the real Pipeline: the engine
        routes the correlation through its manual-SPMD entry point
        (mesh 1x2 -> level 2 of the /32-padded 64x64 net has 8 output
        rows per shard and engages the sharded kernel; coarser levels
        fall back at trace time). GSPMD may retile conv reductions, so
        agreement is near-exact, not bitwise: require ~every pixel equal."""
        monkeypatch.setenv("TRANSFLOW_LITEFLOWNET_RANDOM", "1")
        cv_cfg = str(tmp_path / "cv.json")
        with open(cv_cfg, "w") as file:
            json.dump({"method": "liteflownet"}, file)
        outs = []
        for idx, mesh in enumerate([None, "1x2"]):
            out = str(tmp_path / f"mlfn{idx}-%03d.png")
            cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                         cv_config=cv_cfg,
                         pixmap_sources=[PixmapSourceConfig(assets["image"])],
                         seed=37, mesh=mesh)
            pipeline = run_pipeline(cfg, replace=True)
            if mesh:
                assert pipeline.engine.mesh is not None
                step = pipeline.engine.runtimes[0].estimator_step
                assert step is not None
            outs.append(sorted(tmp_path.glob(f"mlfn{idx}-*.png")))
        assert len(outs[0]) == len(outs[1]) == 11
        for a, b in zip(*outs):
            fa = cv2.imread(str(a)).astype(int)
            fb = cv2.imread(str(b)).astype(int)
            mismatch = (np.abs(fa - fb) > 2).mean()
            assert mismatch < 0.02, (a.name, mismatch)


class TestMultiFlow:

    def test_extra_flows_merge(self, assets, tmp_path):
        """Two flow sources merged with 'sum' (reference --flow/--merge)."""
        out = str(tmp_path / "merged.avi")
        cfg = Config(assets["video"],
                     extra_flow_paths=[assets["video"]],
                     flows_merging_function="sum",
                     output_path=out, vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig("noise")], seed=13)
        pipeline = run_pipeline(cfg, replace=True)
        assert pipeline.cursor == 11
        merged = read_frames(out)
        assert len(merged) == 11
        # sum of two identical flows = doubled displacement; must differ
        # from the single-flow render
        out_single = str(tmp_path / "single.avi")
        cfg2 = Config(assets["video"], output_path=out_single,
                      vcodec="mjpeg",
                      pixmap_sources=[PixmapSourceConfig("noise")], seed=13)
        run_pipeline(cfg2, replace=True)
        single = read_frames(out_single)
        assert not np.array_equal(merged[-1], single[-1])

    def test_two_flows_batched_matches_per_frame(self, assets, tmp_path):
        """Two flow sources + ``--merge sum`` take the chunked scan
        (VERDICT r4 next-#4: multi-flow merges previously dispatched
        per frame) and must be bit-equal to the per-frame path —
        reference mainline at transflow/pipeline.py:149-158,496-507."""
        outs = []
        for idx, batch in enumerate([1, 4]):
            out = str(tmp_path / f"mf{idx}-%03d.png")
            cfg = Config(assets["video"],
                         extra_flow_paths=[assets["video"]],
                         flows_merging_function="sum",
                         output_path=out, vcodec="mjpeg",
                         pixmap_sources=[PixmapSourceConfig(assets["image"])],
                         layers=[LayerConfig(0, reset_mode="random",
                                             reset_random_factor=0.15)],
                         seed=21, batch_frames=batch)
            pipeline = run_pipeline(cfg, replace=True)
            assert pipeline._batch_size == batch
            outs.append(sorted(tmp_path.glob(f"mf{idx}-*.png")))
        assert len(outs[0]) == len(outs[1]) == 11
        for a, b in zip(*outs):
            fa = cv2.imread(str(a))
            fb = cv2.imread(str(b))
            assert np.array_equal(fa, fb), a.name

    def test_mixed_frame_and_flow_sources_batched(self, assets, tmp_path):
        """A frame-yielding source (estimated in the scan, warm-start
        carry) merged with a flow-yielding one (archive replay, no carry)
        batches through the same generalized scan, bit-equal to
        per-frame."""
        exp = str(tmp_path / "exp.avi")
        cfg = Config(assets["video"], output_path=exp, vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig("noise")], seed=22)
        run_pipeline(cfg, replace=True, export_flow=True)
        flow_zip = str(tmp_path / "exp.flow.zip")
        outs = []
        for idx, batch in enumerate([1, 4]):
            out = str(tmp_path / f"mx{idx}-%03d.png")
            cfg2 = Config(assets["video"],
                          extra_flow_paths=[flow_zip],
                          flows_merging_function="average",
                          output_path=out, vcodec="mjpeg",
                          pixmap_sources=[PixmapSourceConfig(assets["image"])],
                          seed=23, batch_frames=batch)
            pipeline = run_pipeline(cfg2, replace=True)
            assert pipeline._batch_size == batch
            outs.append(sorted(tmp_path.glob(f"mx{idx}-*.png")))
        assert len(outs[0]) == len(outs[1]) == 11
        for a, b in zip(*outs):
            fa = cv2.imread(str(a))
            fb = cv2.imread(str(b))
            assert np.array_equal(fa, fb), a.name


class TestFlowUpscale:

    def test_pixmap_larger_than_flow(self, assets, tmp_path):
        """Pixmap at an integer multiple of the flow size: the flow is
        kron-upscaled with magnitude scaling (reference pipeline.py:430-438,
        utils.py:417-418)."""
        big = str(tmp_path / "big.png")
        rng = np.random.default_rng(5)
        PIL.Image.fromarray(
            rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)).save(big)
        out = str(tmp_path / "up.avi")
        cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig(big)], seed=6)
        pipeline = run_pipeline(cfg, replace=True)
        assert pipeline.width_factor == 2 and pipeline.height_factor == 2
        frames = read_frames(out)
        assert len(frames) == 11
        assert frames[0].shape == (96, 128, 3)

    def test_mismatched_resolution_raises(self, assets, tmp_path):
        bad = str(tmp_path / "bad.png")
        PIL.Image.fromarray(
            np.zeros((50, 70, 3), dtype=np.uint8)).save(bad)
        cfg = Config(assets["video"], output_path=str(tmp_path / "x.avi"),
                     vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig(bad)], seed=6)
        with pytest.raises(ValueError, match="Resolutions do not match"):
            run_pipeline(cfg, replace=True)


class TestRobustness:

    def test_cancel_event(self, assets, tmp_path):
        import threading
        out = str(tmp_path / "cancelled.avi")
        cancel = threading.Event()
        cancel.set()  # cancel before the first frame
        cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig("noise")], seed=14)
        pipeline = run_pipeline(cfg, replace=True, cancel_event=cancel)
        assert pipeline.cursor == 0

    def test_safe_mode_checkpoint_on_error(self, assets, tmp_path, monkeypatch):
        out = str(tmp_path / "boom.avi")
        # per-frame path: the failure is injected into _gather_pixmaps,
        # which the chunked path does not use
        cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig("noise")], seed=15,
                     batch_frames=1)
        pipeline = Pipeline(cfg, safe=True, replace=True, progress=False,
                            execute=False)
        calls = {"n": 0}
        original = pipeline._gather_pixmaps

        def explode():
            calls["n"] += 1
            if calls["n"] > 3:
                raise RuntimeError("synthetic failure")
            return original()

        monkeypatch.setattr(pipeline, "_gather_pixmaps", explode)
        monkeypatch.chdir(tmp_path)
        with pytest.raises(RuntimeError, match="synthetic failure"):
            pipeline.run()
        # safe mode: checkpoint + last-config.json written
        assert (tmp_path / "last-config.json").is_file()
        assert list(tmp_path.glob("boom_*.ckpt.zip"))

    def test_infinite_flow_bounded_by_pixmap(self, assets, tmp_path):
        """repeat=0 (infinite flow) + finite video pixmap: the run ends when
        the pixmap is exhausted (reference expected_length semantics)."""
        out = str(tmp_path / "inf.avi")
        cfg = Config(assets["video"], repeat=0, output_path=out,
                     vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig(assets["video"])],
                     seed=16)
        pipeline = run_pipeline(cfg, replace=True)
        assert pipeline.fs_length is None
        assert pipeline.cursor == 12  # bounded by the 12-frame pixmap video

    def test_log_file_handler(self, assets, tmp_path):
        out = str(tmp_path / "logged.avi")
        log_path = tmp_path / "run.log"
        cfg = Config(assets["video"], duration_time=0.2, output_path=out,
                     vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig("noise")], seed=17)
        run_pipeline(cfg, replace=True, log_handler="file",
                     log_level="INFO", log_path=log_path)
        assert log_path.is_file()


class TestDoubleResume:

    def test_checkpoint_of_resumed_run(self, assets, tmp_path):
        """A checkpoint written by a resumed run must store the ABSOLUTE
        cursor so a second resume lands on the right frame."""
        template = str(tmp_path / "r-%03d.png")
        cfg = Config(assets["video"], output_path=template, vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig("cnoise")], seed=21)
        run_pipeline(cfg, replace=True, checkpoint_every=4)
        ckpt1 = str(tmp_path / "r-%03d_00004.ckpt.zip")
        assert os.path.isfile(ckpt1)
        for png in tmp_path.glob("r-*.png"):
            png.rename(tmp_path / png.name.replace("r-", "orig-"))
        # resume once, checkpointing again after 4 more frames (abs 8)
        run_pipeline(Config(ckpt1), replace=True, checkpoint_every=4)
        ckpt2 = str(tmp_path / "r-%03d_00008.ckpt.zip")
        assert os.path.isfile(ckpt2), sorted(
            p.name for p in tmp_path.glob("*.ckpt.zip"))
        with zipfile.ZipFile(ckpt2) as z:
            meta = json.loads(z.read("meta.json"))
        assert meta["cursor"] == 8
        for png in tmp_path.glob("r-*.png"):
            png.rename(tmp_path / ("second-" + png.name))
        # resume the second checkpoint: frame 8 must match the original run
        run_pipeline(Config(ckpt2), replace=True)
        resumed = cv2.imread(str(tmp_path / "r-008.png"))
        original = cv2.imread(str(tmp_path / "orig-008.png"))
        assert resumed is not None and original is not None
        assert np.abs(resumed.astype(int) - original.astype(int)).max() == 0


class TestBatchedRepeat:

    def test_batched_matches_per_frame_with_repeat(self, assets, tmp_path):
        """Rewinds landing mid-chunk (repeat loops) flush the chunk so the
        estimator chain matches the per-frame path exactly."""
        outs = []
        for idx, batch in enumerate([1, 8]):
            out = str(tmp_path / f"rep{idx}-%03d.png")
            cfg = Config(assets["video"], repeat=2, duration_time=0.7,
                         output_path=out, vcodec="mjpeg",
                         pixmap_sources=[PixmapSourceConfig(assets["image"])],
                         seed=22, batch_frames=batch)
            run_pipeline(cfg, replace=True)
            outs.append(sorted(tmp_path.glob(f"rep{idx}-*.png")))
        assert len(outs[0]) == len(outs[1]) == 14  # 2 x 7 flows
        for a, b in zip(*outs):
            fa, fb = cv2.imread(str(a)), cv2.imread(str(b))
            assert np.array_equal(fa, fb), a.name


class TestProfileDump:
    """Both the per-frame and the batched (--batch-frames) path must write a
    .profile.json next to the output (observability parity)."""

    @pytest.mark.parametrize("batch", [1, 4])
    def test_profile_json_written(self, assets, tmp_path, batch):
        out = str(tmp_path / f"out_b{batch}.avi")
        cfg = Config(assets["video"], output_path=out, vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig(assets["image"])],
                     seed=3, batch_frames=batch)
        run_pipeline(cfg, replace=True, profile=True)
        profile_path = cfg.get_secondary_output_path(".profile.json")
        assert os.path.isfile(profile_path), profile_path
        with open(profile_path, encoding="utf8") as file:
            report = json.load(file)
        assert "device_step" in report["stages"]
        assert report["stages"]["device_step"]["count"] > 0
        assert report["frames"] > 0
