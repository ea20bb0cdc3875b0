from .base import (  # noqa: F401
    Status,
    TransientError,
    Transformer,
    RetryingStage,
    build_chain,
    apply_chain_batch,
)
from .transforms import (  # noqa: F401
    NormalizeStage,
    UppercaseStage,
    DropRoleStage,
    FanoutStage,
    ErrorThenOKStage,
    TRANSFORM_REGISTRY,
)
from .subprocess_stage import (  # noqa: F401
    SubprocessTransformer,
    serve_plugin,
)
