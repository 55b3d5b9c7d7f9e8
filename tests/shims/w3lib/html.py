from scrapely_spark.html.entities import replace_entities, remove_comments  # noqa: F401
