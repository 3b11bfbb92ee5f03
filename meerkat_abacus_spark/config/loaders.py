"""Config loaders: the reference's CSV/JSON config artifacts → compiled specs.

A user of the reference brings a country-config directory — codes CSVs
(variable_codes/*.csv), demo_links.csv, data_types.csv, calculation
parameter JSON blobs.  These loaders parse those exact formats (headers per
FIXTURES.md §2) into this engine's Rule / LinkDef / DataTypeSpec dataclasses,
which then compile into DataFrame plans.

Reference import logic: consumer/database_setup.py:56-88 (variables — drops
empty-header columns, splits ``category`` into a list), util/__init__.py:
107-119 (links), util/data_types.py:5-15 (data types), database_setup.py:
331-362 (calculation parameters).

Config files are tiny; parsing is driver-side stdlib csv, not a Spark job.
"""

from __future__ import annotations

import csv
import json
from pathlib import Path

from meerkat_abacus_spark.operators.coding import Rule
from meerkat_abacus_spark.operators.links import LinkDef
from meerkat_abacus_spark.operators.to_data_type import DataTypeSpec


def _rows(path: str | Path) -> list[dict]:
    with open(path, newline="", encoding="utf-8") as fh:
        out = []
        for row in csv.DictReader(fh):
            row.pop("", None)  # trailing empty-header columns
            row.pop(None, None)
            out.append(row)
        return out


def _split_category(raw: str | None) -> list[str]:
    """database_setup.py field_to_list semantics: comma-separated list."""
    if not raw:
        return []
    return [c.strip() for c in raw.split(",") if c.strip()]


def load_rules_csv(path: str | Path) -> list[Rule]:
    """variable_codes CSV → Rule list (header: demo_codes.csv:1)."""
    rules = []
    for row in _rows(path):
        if not row.get("id") or not row.get("method"):
            continue
        rules.append(
            Rule(
                id=row["id"],
                method=row["method"].strip(),
                db_column=(row.get("db_column") or "").strip(),
                condition=(row.get("condition") or "").strip(),
                calculation=(row.get("calculation") or "").strip() or None,
                category=_split_category(row.get("category")),
                calculation_group=(row.get("calculation_group") or "").strip()
                or None,
                calculation_priority=(
                    int(row["calculation_priority"])
                    if (row.get("calculation_priority") or "").strip()
                    else None
                ),
                multiple_link=(row.get("multiple_link") or "").strip() or None,
                alert=bool((row.get("alert") or "").strip()),
                alert_type=(row.get("alert_type") or "").strip() or None,
                disregard=(row.get("disregard") or "").strip() in ("1", "true"),
                type=(row.get("type") or "case").strip(),
                form=(row.get("form") or "").strip() or None,
            )
        )
    return rules


def load_links_csv(path: str | Path) -> list[LinkDef]:
    """demo_links.csv → LinkDef list (header: demo_links.csv:1)."""
    links = []
    for row in _rows(path):
        if not row.get("name"):
            continue
        links.append(
            LinkDef(
                name=row["name"],
                type=(row.get("type") or "").strip(),
                to_form=row["to_form"],
                from_form=row["from_form"],
                from_column=row["from_column"],
                to_column=row["to_column"],
                method=(row.get("method") or "match").strip(),
                order_by=(row.get("order_by") or "").strip(),
                uuid=(row.get("uuid") or "meta/instanceID").strip(),
                to_condition=(row.get("to_condition") or "").strip(),
            )
        )
    return links


def load_data_types_csv(path: str | Path) -> list[DataTypeSpec]:
    """data_types.csv → DataTypeSpec list (header: data_types.csv:1)."""
    specs = []
    for row in _rows(path):
        if not row.get("name"):
            continue
        specs.append(
            DataTypeSpec(
                name=row["name"],
                type=row["type"],
                form=row["form"],
                db_column=(row.get("db_column") or "").strip() or None,
                condition=(row.get("condition") or "").strip() or None,
                date=(row.get("date") or "").strip() or None,
                var=(row.get("var") or "").strip() or None,
                uuid=(row.get("uuid") or "meta/instanceID").strip(),
                location=(row.get("location") or "deviceid").strip(),
                multiple_row=(row.get("multiple_row") or "").strip() or None,
            )
        )
    return specs


def load_calculation_parameters(directory: str | Path) -> dict[str, dict]:
    """calculation_parameters/*.json → {name: blob} (database_setup.py:331-362).

    Exposed as plain dicts; pipelines broadcast them or inline them into
    rule compilation as literal lookup maps.
    """
    out = {}
    for p in sorted(Path(directory).glob("*.json")):
        with open(p, encoding="utf-8") as fh:
            out[p.stem] = json.load(fh)
    return out


def load_geojson_polygons(path: str | Path) -> list[dict]:
    """GeoJSON FeatureCollection → polygon rows for geo.locate_points.

    Reference: consumer/database_setup.py:226-252 reads Polygon/MultiPolygon
    features keyed by ``properties.Name``.  Each output row is
    ``{name, priority, vertices: [{x, y}, ...]}`` using the exterior ring
    (holes are out of the reference's analytical scope); MultiPolygons emit
    one row per part sharing the name, so containment in any part matches.
    """
    with open(path, encoding="utf-8") as fh:
        doc = json.load(fh)
    rows = []
    for i, feat in enumerate(doc.get("features", [])):
        name = (feat.get("properties") or {}).get("Name", f"feature_{i}")
        geom = feat.get("geometry") or {}
        gtype = geom.get("type")
        coords = geom.get("coordinates") or []
        parts = [coords] if gtype == "Polygon" else coords
        for part in parts:
            if not part:
                continue
            exterior = part[0]
            rows.append(
                {
                    "name": name,
                    "priority": i + 1,
                    "vertices": [
                        {"x": float(x), "y": float(y)} for x, y in exterior
                    ],
                }
            )
    return rows
