from theia_tpu.data.webdataset import (
    ShardWriter,
    check_existing_shard,
    decode_image_npy,
    encode_image_npy,
    iter_samples,
    load_safetensors_np,
    save_safetensors_np,
)
from theia_tpu.data.stats import load_feature_stats, normalize_feature
from theia_tpu.data.dataset import (
    RandomMix,
    get_frame_dataloader,
    get_frame_iterator,
    get_image_video_dataset,
    normalize_ds_weights_by_ds_len,
    pad_shard_paths,
)

__all__ = [
    "ShardWriter",
    "check_existing_shard",
    "decode_image_npy",
    "encode_image_npy",
    "iter_samples",
    "load_safetensors_np",
    "save_safetensors_np",
    "load_feature_stats",
    "normalize_feature",
    "RandomMix",
    "get_frame_dataloader",
    "get_frame_iterator",
    "get_image_video_dataset",
    "normalize_ds_weights_by_ds_len",
    "pad_shard_paths",
]
