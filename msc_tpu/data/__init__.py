from msc_tpu.data.nuscenes import (
    CAMERA_CHANNELS,
    NuScenesLoader,
    MockNuScenesLoader,
    create_loader,
)

__all__ = [
    "CAMERA_CHANNELS",
    "NuScenesLoader",
    "MockNuScenesLoader",
    "create_loader",
]
