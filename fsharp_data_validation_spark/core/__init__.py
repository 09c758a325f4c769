"""Pure-Python semantic kernel — the row-level oracle for the Spark engine.

Re-expresses the reference library's applicative validation semantics
(/root/reference/src/FSharp.Data.Validation/) so the ported reference test
suite pins them, and so Spark results can be cross-checked row-by-row.
"""

from .names import Path, element_name, mk_name, render_path, to_camel_case
from .failures import FailureMap, map_keys, merge_failures, prefix_keys
from .valuectx import ELEMENT, FIELD, GLOBAL, ValueCtx
from .proof import (
    Invalid,
    InvalidProofException,
    Proof,
    Valid,
    ValidationFailures,
    combine,
    flatten_proofs,
    is_invalid,
    is_valid,
    map_invalid,
    proof_map,
    raise_if_invalid,
    to_result,
    to_validation_failures,
)
from .vctx import (
    DISPUTED,
    REFUTED,
    VALID,
    Validation,
    VCtx,
    apply_failures,
    bind,
    disputed_ctx,
    from_vctx,
    merge_all,
    merge_sources,
    refuted_ctx,
    valid_ctx,
    vmap,
    with_field,
    with_value,
)
from . import library
from .serialize import render_failures_json, render_proof_json
