"""Config + dimension-map loading (reference operators S4/S5, J2, A10).

* :func:`load_config` — JSON config with the reference's CWD
  path-traversal rejection (CWE-22 guard, loaders.py:5-16).
* :func:`enrich_with_river_mappings` — sensor→river-mile side table →
  ``SENSOR_TO_RIVER`` dict + ``RIVER_TO_SENSORS`` grouped lists
  (batch_correction.py:409-437; the groupby-collect-list is driver-side —
  a 32-row dimension table never needs a shuffle).
* :func:`filter_series_by_river_miles` — the J2 broadcast semi-join:
  series work-list ∩ sensors at the requested river miles
  (batch_correction.py:156-218).
"""

from __future__ import annotations

import json
import os

import pandas as pd


def load_config(config_path: str) -> dict:
    """JSON config; rejects paths outside the current working directory
    (the reference's CWE-22 guard)."""
    resolved = os.path.realpath(config_path)
    cwd = os.path.realpath(os.getcwd())
    if not resolved.startswith(cwd + os.sep) and resolved != cwd:
        raise ValueError(f"config path escapes working directory: {config_path}")
    with open(resolved) as f:
        return json.load(f)


def enrich_with_river_mappings(config: dict,
                               river_map: pd.DataFrame | str | None) -> dict:
    """Attach SENSOR_TO_RIVER / RIVER_TO_SENSORS derived maps.

    ``river_map``: DataFrame or CSV path with columns SENSOR_ID,
    RIVER_MILE.  Missing/None → maps absent (reference behavior)."""
    out = dict(config)
    if river_map is None:
        return out
    if isinstance(river_map, str):
        if not os.path.exists(river_map):
            return out
        river_map = pd.read_csv(river_map)
    out["SENSOR_TO_RIVER"] = dict(
        zip(river_map["SENSOR_ID"], river_map["RIVER_MILE"]))
    out["RIVER_TO_SENSORS"] = (
        river_map.groupby("RIVER_MILE")["SENSOR_ID"].agg(list).to_dict())
    return out


def filter_series_by_river_miles(series_ids: list[int],
                                 river_miles: list[float] | str,
                                 config: dict) -> list[int]:
    """J2 broadcast semi-join: keep series whose sensor id maps to one of
    the requested river miles.  ``river_miles='all'`` → union of every
    mile's sensors ∩ series_ids (batch_correction.py:167-218)."""
    river_to_sensors = config.get("RIVER_TO_SENSORS", {})
    if not river_to_sensors:
        return sorted(series_ids)
    if river_miles == "all":
        allowed: set[int] = set()
        for sensors in river_to_sensors.values():
            allowed.update(sensors)
    else:
        allowed = set()
        for mile in river_miles:
            allowed.update(river_to_sensors.get(mile, []))
    return sorted(set(series_ids) & allowed)
