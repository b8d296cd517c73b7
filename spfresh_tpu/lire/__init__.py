"""LIRE / SPFresh in-place update subsystem (parity:
/root/reference/src/spann/lire/ — completed, not stubbed; see SURVEY.md §5
quirks 4-5 for what the reference left unfinished)."""

from spfresh_tpu.lire.fresh import SpFreshIndex
from spfresh_tpu.lire.lazy_fresh import LazySpFreshIndex
from spfresh_tpu.lire.packed_storage import PackedLireStorage
from spfresh_tpu.lire.operations import (
    LireContext,
    LireOperationError,
    Merge,
    MergeError,
    ReassignError,
    SplitError,
    OperationResult,
    PartitionOperation,
    Reassign,
    Split,
)
from spfresh_tpu.lire.pipeline import (
    PartitionStatus,
    PipelineError,
    TaskOutcome,
    TwoStagePipeline,
)
from spfresh_tpu.lire.protocol import LireConfig, LireProtocol, UpdateResult
from spfresh_tpu.lire.storage import LireStorage, LireStorageError, PostingMetadata

__all__ = [
    "LireConfig",
    "LireContext",
    "LireOperationError",
    "LireProtocol",
    "LireStorage",
    "LireStorageError",
    "LazySpFreshIndex",
    "PackedLireStorage",
    "Merge",
    "MergeError",
    "OperationResult",
    "PartitionOperation",
    "PartitionStatus",
    "PipelineError",
    "PostingMetadata",
    "Reassign",
    "SpFreshIndex",
    "Split",
    "SplitError",
    "ReassignError",
    "TaskOutcome",
    "TwoStagePipeline",
    "UpdateResult",
]
