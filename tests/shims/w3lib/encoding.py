from scrapely_spark.html.entities import html_to_unicode  # noqa: F401
