from .exactly_once import (  # noqa: F401
    part_file_path,
    write_part_file,
    read_committed,
    committed_files,
    SINK_REGISTRY,
)
