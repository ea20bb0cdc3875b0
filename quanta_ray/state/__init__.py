from .checkpoint import (  # noqa: F401
    LowWatermarkTracker,
    CommitThrottle,
    write_json_atomic,
    write_manifest,
    read_manifest,
    latest_committed_epoch,
)
