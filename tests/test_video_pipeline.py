"""Video preprocessing pipeline: real encoded videos -> subsampled frame
shards -> split -> loader round trip (reference:
src/theia/scripts/preprocessing/video_datasets/subsampling_videos.py:81-182).

Generates tiny real webm/mp4 files (cv2 VideoWriter) and a jpg-tar
(epic_kitchen layout), so the frame iterators run on actual codec output.
"""

import io
import os
import shutil
import tarfile

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from theia_tpu.data.dataset import get_frame_dataloader, get_image_video_dataset
from theia_tpu.scripts.subsampling_videos import (
    iter_jpg_tar_frames,
    iter_video_frames,
    main as subsample_main,
)
from theia_tpu.data.webdataset import iter_samples, decode_image_npy


def _write_video(path: str, n_frames: int, fourcc: str, size: int = 64) -> list[np.ndarray]:
    """Write frames with distinct solid colors (robust to lossy codecs)."""
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*fourcc), 10, (size, size))
    assert writer.isOpened(), f"no codec for {path}"
    frames = []
    for i in range(n_frames):
        rgb = np.zeros((size, size, 3), np.uint8)
        rgb[..., 0] = (i * 17) % 200 + 20
        rgb[..., 1] = 128
        rgb[..., 2] = 255 - ((i * 17) % 200 + 20)
        frames.append(rgb)
        writer.write(cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
    writer.release()
    return frames


def test_video_iterators_subsample_correctly(tmp_path):
    frames = _write_video(str(tmp_path / "v.mp4"), 70, "mp4v")
    got = list(iter_video_frames(str(tmp_path / "v.mp4"), rate=32))
    assert [i for i, _ in got] == [0, 32, 64]
    for idx, frame in got:
        assert frame.shape == (64, 64, 3)
        assert np.mean(np.abs(frame.astype(int) - frames[idx].astype(int))) < 12

    # epic_kitchen layout: tar of jpgs
    tar_path = str(tmp_path / "e.tar")
    with tarfile.open(tar_path, "w") as t:
        for i in range(7):
            ok, buf = cv2.imencode(".jpg", np.full((48, 48, 3), i * 30, np.uint8))
            info = tarfile.TarInfo(f"frame_{i:010d}.jpg")
            info.size = len(buf)
            t.addfile(info, io.BytesIO(buf.tobytes()))
    got = list(iter_jpg_tar_frames(tar_path, rate=3))
    assert [i for i, _ in got] == [0, 3, 6]
    assert got[0][1].shape == (48, 48, 3)


def test_subsampling_cli_to_loader_round_trip(tmp_path):
    raw = tmp_path / "raw_ssv2"
    raw.mkdir()
    want = {}
    for v in range(2):
        frames = _write_video(str(raw / f"vid{v}.webm"), 70, "VP80")
        for idx in (0, 32, 64):
            want[f"vid{v}_{idx:08d}"] = frames[idx]

    out = tmp_path / "data"
    argv = [
        "--dataset", "ssv2", "--dataset-path", str(raw), "--output-path", str(out),
        "--samples-per-shard", "4",
    ]
    subsample_main(argv)
    shard_dir = out / "ssv2_1in32_images"
    shards = sorted(os.listdir(shard_dir))
    assert len(shards) == 2  # 6 frames at 4/shard

    seen = {}
    for s in shards:
        for key, fields in iter_samples(str(shard_dir / s)):
            img = decode_image_npy(fields["image"])
            assert img.shape == (224, 224, 3) and img.dtype == np.uint8
            seen[key] = img
    assert set(seen) == set(want)
    for key, img in seen.items():
        src = cv2.resize(want[key], (224, 224), interpolation=cv2.INTER_LINEAR)
        assert np.mean(np.abs(img.astype(int) - src.astype(int))) < 12, key

    # resume: second run must not rewrite complete shards
    mtimes = {s: os.path.getmtime(shard_dir / s) for s in shards}
    subsample_main(argv)
    assert {s: os.path.getmtime(shard_dir / s) for s in shards} == mtimes

    # split -> loader round trip (dataset layout: <root>/<ds>/images/)
    ds_dir = out / "ssv2_1in32" / "images"
    ds_dir.parent.mkdir()
    shutil.move(str(shard_dir), str(ds_dir))
    from theia_tpu.scripts.split_dataset import main as split_main

    split_main(["--dataset-root", str(out), "--datasets", "ssv2_1in32",
                "--samples-per-shard", "4"])
    import json

    splits = json.load(open(out / "ssv2_1in32" / "splits.json"))
    assert splits["train"] >= 4 and sum(splits.values()) == 6

    ds, expected = get_image_video_dataset(
        dataset_root=str(out), feature_models=[], dataset_mix=["ssv2_1in32"],
        split="train", seed=0,
    )
    assert expected == splits["train"]
    batch = next(iter(get_frame_dataloader(ds, batch_size=2)))
    assert batch["image"].shape == (2, 224, 224, 3)
