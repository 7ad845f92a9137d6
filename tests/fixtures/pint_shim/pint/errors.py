"""pint.errors stand-in (see package docstring)."""


class DimensionalityError(ValueError):
    def __init__(self, units1="", units2="", *a, **k):
        super().__init__(f"Cannot convert from '{units1}' to '{units2}'")
        self.units1 = units1
        self.units2 = units2


class UndefinedUnitError(AttributeError):
    pass
