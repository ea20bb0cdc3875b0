from .stream import (  # noqa: F401
    list_epoch_files,
    epoch_max_ts_us,
    precompute_watermarks,
    SOURCE_DRIVERS,
    SOURCE_REGISTRY,
    get_driver,
)
