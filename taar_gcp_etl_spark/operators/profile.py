"""Client-profile operators: the clients_last_seen → serving-table pipeline
pieces (SURVEY.md §2.2 P1-P4, §2.7 F19).

F19 — array-of-struct → struct-of-arrays transpose. The reference defines
`explode_active_addons` (taar_etl/taar_profile_bigtable.py:227-292) producing
16 parallel `addon_*` arrays from `active_addons[]` (dead code there, but it
documents the flattened profile schema, so the engine implements it as the
canonical transposition operator). Spark-first: one `F.transform` per field —
pure Column expressions, zero shuffle, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (output column, struct field, default for null) — mirrors the reference's
# per-field `or` defaults (taar_etl/taar_profile_bigtable.py:270-290).
_ADDON_FIELDS: list[tuple[str, str, object]] = [
    ("addon_addon_id", "addon_id", ""),
    ("addon_blocklisted", "blocklisted", False),
    ("addon_name", "name", ""),
    ("addon_user_disabled", "user_disabled", False),
    ("addon_app_disabled", "app_disabled", False),
    ("addon_version", "version", ""),
    ("addon_scope", "scope", 0),
    ("addon_type", "type", ""),
    ("addon_foreign_install", "foreign_install", False),
    ("addon_has_binary_components", "has_binary_components", False),
    ("addon_install_day", "install_day", 0),
    ("addon_update_day", "update_day", 0),
    ("addon_signed_state", "signed_state", 0),
    ("addon_is_system", "is_system", False),
    ("addon_is_web_extension", "is_web_extension", False),
    ("addon_multiprocess_compatible", "multiprocess_compatible", False),
]


def transpose_active_addons(
    df: DataFrame, addons_col: str = "active_addons"
) -> DataFrame:
    """F19 — one `addon_<field>` array column per struct field, null-coerced
    to the reference defaults. Equivalent to explode + 16×collect_list but
    without the shuffle either would cost."""

    def field_array(field: str, default) -> Column:
        return F.transform(
            F.col(addons_col),
            lambda a: F.coalesce(a[field], F.lit(default)),
        )

    cols = [c for c in df.columns if c != addons_col]
    return df.select(
        *cols,
        *[
            field_array(field, default).alias(out)
            for out, field, default in _ADDON_FIELDS
        ],
    )
