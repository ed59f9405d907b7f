from .basic import (clone_model, extract_deterministics,
                    insert_deterministics,
                    prune_vars_detached_from_observed,
                    remove_minibatched_nodes)
from .conditioning import (change_value_transforms, do, observe,
                           remove_value_transforms)
from .optimization import freeze_dims_and_data, freeze_model

__all__ = [
    "clone_model",
    "do",
    "observe",
    "change_value_transforms",
    "remove_value_transforms",
    "extract_deterministics",
    "insert_deterministics",
    "freeze_dims_and_data",
    "freeze_model",
    "prune_vars_detached_from_observed",
    "remove_minibatched_nodes",
]
