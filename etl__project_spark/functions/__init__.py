from etl__project_spark.functions.scalar import (  # noqa: F401
    PLATFORM_TOKENS,
    datetime_components,
    datetime_key,
    head_token,
    minute_truncate,
    parse_iso_minute,
    platform_of,
    site_of,
    video_of,
)
