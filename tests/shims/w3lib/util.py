from scrapely_spark.html.entities import str_to_unicode  # noqa: F401


def unicode_to_str(text, encoding='utf-8'):
    if isinstance(text, str):
        return text.encode(encoding)
    return text
