from hrviton_tpu.pipelines.tryon import (ConditionOutputs, compose_clothmask,
                                         condition_forward, remove_overlap,
                                         tryon_forward)

__all__ = ["ConditionOutputs", "compose_clothmask", "condition_forward",
           "remove_overlap", "tryon_forward"]
