"""Open-parameter validation seam — friendly errors at the API edge.

The reference validates open/search params against per-accessor JSON schemas
BEFORE building anything (``store.py:201-205`` schema.validate_instance;
schema definition e.g. ``accessors/sen2.py:187-200``), so a typo'd band or
inverted bbox fails with a named parameter instead of a KeyError five dask
layers deep. This module is that seam for the Spark engine: a declarative
schema (JSON-Schema-shaped dict, so a real jsonschema validator can replace
the built-in one when the package is present) plus a dependency-free
validator covering the subset the schemas use.
"""

from __future__ import annotations

import datetime as dt
import numbers
from typing import Any

#: open-params schema for build_cube (JSON-Schema shaped; mirrors the
#: reference's open_params schema fields sen2.py:187-200)
CUBE_OPEN_PARAMS_SCHEMA: dict = {
    "type": "object",
    "properties": {
        "bbox": {
            "type": "array",
            "items": {"type": "number"},
            "minItems": 4,
            "maxItems": 4,
            "description": "(xmin, ymin, xmax, ymax) in degrees, "
            "xmin<xmax, -90<=ymin<ymax<=90",
        },
        "time_range": {
            "type": "array",
            "items": {"type": "string", "format": "date-time"},
            "minItems": 2,
            "maxItems": 2,
        },
        "bands": {
            "type": "array",
            "items": {"type": "string", "minLength": 1},
            "minItems": 1,
        },
        "collections": {
            "type": "array",
            "items": {"type": "string", "minLength": 1},
        },
        "query": {"type": "object"},
    },
}


class ParamValidationError(ValueError):
    """Raised when an open parameter fails schema validation."""


def _fail(path: str, msg: str):
    raise ParamValidationError(f"invalid parameter {path}: {msg}")


def _parse_dt(s: str, path: str) -> dt.datetime:
    try:
        return dt.datetime.fromisoformat(str(s).replace("Z", "+00:00"))
    except ValueError:
        _fail(path, f"not an ISO date/datetime: {s!r}")


def _validate_node(value: Any, schema: dict, path: str) -> None:
    t = schema.get("type")
    if t == "array":
        if isinstance(value, (str, bytes)) or not hasattr(value, "__len__"):
            _fail(path, f"expected a sequence, got {type(value).__name__}")
        n = len(value)
        if "minItems" in schema and n < schema["minItems"]:
            _fail(path, f"expected >= {schema['minItems']} items, got {n}")
        if "maxItems" in schema and n > schema["maxItems"]:
            _fail(path, f"expected <= {schema['maxItems']} items, got {n}")
        item_schema = schema.get("items")
        if item_schema:
            for i, v in enumerate(value):
                _validate_node(v, item_schema, f"{path}[{i}]")
    elif t == "number":
        if not isinstance(value, numbers.Real) or isinstance(value, bool):
            _fail(path, f"expected a number, got {value!r}")
    elif t == "string":
        if not isinstance(value, str):
            _fail(path, f"expected a string, got {type(value).__name__}")
        if len(value) < schema.get("minLength", 0):
            _fail(path, "empty string")
        if schema.get("format") == "date-time":
            _parse_dt(value, path)
    elif t == "object":
        if not isinstance(value, dict):
            _fail(path, f"expected a mapping, got {type(value).__name__}")


def validate_open_params(
    bbox=None, time_range=None, bands=None, collections=None, query=None
) -> None:
    """Validate build_cube open params; raises ParamValidationError naming
    the offending parameter. Semantic checks (ordering, ranges) run after
    the structural schema pass."""
    params = dict(
        bbox=bbox, time_range=time_range, bands=bands,
        collections=collections, query=query,
    )
    for name, value in params.items():
        if value is None:
            continue
        _validate_node(value, CUBE_OPEN_PARAMS_SCHEMA["properties"][name], name)
    if bbox is not None:
        x0, y0, x1, y1 = (float(v) for v in bbox)
        if not x0 < x1:
            _fail("bbox", f"xmin ({x0}) must be < xmax ({x1})")
        if not y0 < y1:
            _fail("bbox", f"ymin ({y0}) must be < ymax ({y1})")
        if y0 < -90.0 or y1 > 90.0:
            _fail("bbox", f"latitudes out of [-90, 90]: ({y0}, {y1})")
    if time_range is not None:
        t0 = _parse_dt(time_range[0], "time_range[0]")
        t1 = _parse_dt(time_range[1], "time_range[1]")
        # normalize naive endpoints to UTC: a 'Z'-suffixed start mixed with a
        # naive end must yield the documented ordering error, not a TypeError
        if t0.tzinfo is None:
            t0 = t0.replace(tzinfo=dt.timezone.utc)
        if t1.tzinfo is None:
            t1 = t1.replace(tzinfo=dt.timezone.utc)
        if t0 > t1:
            _fail("time_range", f"start {time_range[0]!r} after end {time_range[1]!r}")
    if query is not None:
        for k, v in query.items():
            if not isinstance(k, str):
                _fail("query", f"property names must be strings, got {k!r}")
            if isinstance(v, (str, bytes)) or not hasattr(v, "__iter__"):
                _fail(f"query[{k!r}]", "expected a list of allowed values")
