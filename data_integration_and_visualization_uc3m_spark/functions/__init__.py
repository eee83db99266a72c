"""Static reference data and scalar helpers (pure-Python, no Spark
session required at import): the ISO 3166-1 country universe
(``iso3166``) mirroring the reference's pycountry usage."""
