"""Environment/config validation (SURVEY.md §2 A2).

The reference binds its "query parameters" by fetching stored layer
config and TypeBox-validating it: ``await this.env(Environment)``
(/root/reference/task.ts:68) against the schema at task.ts:26-45 —
``IncidentRange`` an optional enum of four values, ``DispatchCenters``
an array of objects with optional ``CenterCode``, ``DEBUG`` boolean
defaulting to false.  Validation failure throws (Lambda fails before
any fetch).

This module is the engine's equivalent: a plain-dict → typed-record
check with the same shape, the same enum, the same defaults, and
throw-on-mismatch semantics.  The JS-truthiness subtlety survives
downstream, not here: an ABSENT IncidentRange disables the time filter
entirely (task.ts:109 ``if (env.IncidentRange)``), so the validated
record keeps ``None`` rather than injecting a default range.
"""

from __future__ import annotations

from dataclasses import dataclass

# task.ts:27-35 — the four legal range strings (order preserved)
INCIDENT_RANGE_ENUM = ("24 Hours", "48 Hours", "72 Hours", "1 Week")


@dataclass(frozen=True)
class Environment:
    """Validated config record (task.ts:26-45)."""

    dispatch_centers: tuple[str | None, ...] = ()
    incident_range: str | None = None
    debug: bool = False


def validate_environment(raw: dict) -> Environment:
    """Validate a raw config dict, raising ``ValueError`` on any shape
    violation (the reference's TypeBox throw).  Unknown keys are
    ignored (TypeBox default: additionalProperties allowed)."""
    if not isinstance(raw, dict):
        raise ValueError(f"Environment must be an object, got {type(raw).__name__}")

    rng = raw.get("IncidentRange")
    if rng is not None and rng not in INCIDENT_RANGE_ENUM:
        raise ValueError(
            f"IncidentRange must be one of {INCIDENT_RANGE_ENUM}, got {rng!r}"
        )

    centers_raw = raw.get("DispatchCenters", [])
    if not isinstance(centers_raw, (list, tuple)):
        raise ValueError("DispatchCenters must be an array")
    centers: list[str | None] = []
    for i, entry in enumerate(centers_raw):
        # task.ts:36-40: array items are objects with optional CenterCode
        if isinstance(entry, dict):
            code = entry.get("CenterCode")
            if code is not None and not isinstance(code, str):
                raise ValueError(f"DispatchCenters[{i}].CenterCode must be a string")
            centers.append(code)
        elif isinstance(entry, str):  # convenience: bare code strings
            centers.append(entry)
        else:
            raise ValueError(f"DispatchCenters[{i}] must be an object")

    debug = raw.get("DEBUG", False)  # task.ts:41-44: default false
    if not isinstance(debug, bool):
        raise ValueError("DEBUG must be a boolean")

    return Environment(
        dispatch_centers=tuple(centers), incident_range=rng, debug=debug
    )
