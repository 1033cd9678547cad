"""Typed schemas for the reference data model (SURVEY.md §1, FIXTURES.md §B).

The reference declares its addon-catalog schema as `JSONSchema` subclasses
(reference: taar_etl/taar_amodump.py:52-76) and its profile shape inside a
BigQuery CTAS select list (taar_etl/taar_profile_bigtable.py:76-91) plus the
`explode_active_addons` element layout (:270-290). Here both are fixed
StructTypes: schema-on-read at ingestion (`from_json` with these types gives
the reference's drop-unknown/null-missing/coercing `marshal` semantics,
taar_etl/taar_amodump.py:255-291), fixed-schema at the DataFrame layer.
"""

from pyspark.sql import types as T

AMO_ADDON_FILE = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("platform", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("is_webextension", T.BooleanType()),
    ]
)

AMO_ADDON_VERSION = T.StructType(
    [T.StructField("files", T.ArrayType(AMO_ADDON_FILE))]
)

# AMOAddonInfo (taar_etl/taar_amodump.py:64-76) + job-added enrichments:
# first_create_date (taar_amodump.py:205), promoted (taar_amowhitelist.py:52-54).
AMO_ADDON = T.StructType(
    [
        T.StructField("guid", T.StringType()),
        T.StructField("default_locale", T.StringType()),
        T.StructField("name", T.MapType(T.StringType(), T.StringType())),
        T.StructField("description", T.MapType(T.StringType(), T.StringType())),
        T.StructField("summary", T.MapType(T.StringType(), T.StringType())),
        T.StructField(
            "categories", T.MapType(T.StringType(), T.ArrayType(T.StringType()))
        ),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("weekly_downloads", T.LongType()),
        T.StructField(
            "ratings",
            T.StructType(
                [
                    T.StructField("average", T.DoubleType()),
                    T.StructField("count", T.LongType()),
                ]
            ),
        ),
        T.StructField("current_version", AMO_ADDON_VERSION),
        T.StructField(
            "promoted", T.StructType([T.StructField("category", T.StringType())])
        ),
        T.StructField("first_create_date", T.StringType()),
    ]
)

# active_addons element (taar_etl/taar_profile_bigtable.py:270-290).
ACTIVE_ADDON = T.StructType(
    [
        T.StructField("addon_id", T.StringType()),
        T.StructField("blocklisted", T.BooleanType()),
        T.StructField("name", T.StringType()),
        T.StructField("user_disabled", T.BooleanType()),
        T.StructField("app_disabled", T.BooleanType()),
        T.StructField("version", T.StringType()),
        T.StructField("scope", T.IntegerType()),
        T.StructField("type", T.StringType()),
        T.StructField("foreign_install", T.BooleanType()),
        T.StructField("has_binary_components", T.BooleanType()),
        T.StructField("install_day", T.IntegerType()),
        T.StructField("update_day", T.IntegerType()),
        T.StructField("signed_state", T.IntegerType()),
        T.StructField("is_system", T.BooleanType()),
        T.StructField("is_web_extension", T.BooleanType()),
        T.StructField("multiprocess_compatible", T.BooleanType()),
    ]
)

# clients_last_seen projection input (taar_etl/taar_profile_bigtable.py:76-91).
CLIENTS_PROFILE = T.StructType(
    [
        T.StructField("client_id", T.StringType()),
        T.StructField("submission_date", T.DateType()),
        T.StructField("city", T.StringType()),
        T.StructField("subsession_hours_sum", T.DoubleType()),
        T.StructField("locale", T.StringType()),
        T.StructField("os", T.StringType()),
        T.StructField("places_bookmarks_count_mean", T.DoubleType()),
        T.StructField(
            "scalar_parent_browser_engagement_tab_open_event_count_sum",
            T.DoubleType(),
        ),
        T.StructField(
            "scalar_parent_browser_engagement_total_uri_count_sum", T.DoubleType()
        ),
        T.StructField(
            "scalar_parent_browser_engagement_unique_domains_count_mean",
            T.DoubleType(),
        ),
        T.StructField("active_addons", T.ArrayType(ACTIVE_ADDON)),
    ]
)

# Editorial/recommended row (taar_etl/taar_update_whitelist.py:44-48).
EDITORIAL_ROW = T.StructType(
    [
        T.StructField(
            "addon", T.StructType([T.StructField("guid", T.StringType())])
        )
    ]
)
