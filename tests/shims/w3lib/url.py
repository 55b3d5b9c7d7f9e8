from scrapely_spark.html.entities import safe_url_string  # noqa: F401
