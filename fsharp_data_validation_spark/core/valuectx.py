"""ValueCtx — tags the value under validation with *where* it lives.

Reference: /root/reference/src/FSharp.Data.Validation/ValueCtx.fs:3-26.
``Element(i, a) | Field(name, a) | Global(a)``; determines where failures
are filed (element index path, field name path, or type-level list).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

ELEMENT = "element"
FIELD = "field"
GLOBAL = "global"


@dataclass(frozen=True)
class ValueCtx:
    tag: str
    value: Any
    name: str | None = None  # FIELD
    index: int | None = None  # ELEMENT

    @staticmethod
    def element(i: int, a: Any) -> "ValueCtx":
        return ValueCtx(ELEMENT, a, index=i)

    @staticmethod
    def field(name: str, a: Any) -> "ValueCtx":
        return ValueCtx(FIELD, a, name=name)

    @staticmethod
    def global_(a: Any) -> "ValueCtx":
        return ValueCtx(GLOBAL, a)

    def get_value(self) -> Any:
        return self.value

    def set_value(self, b: Any) -> "ValueCtx":
        return ValueCtx(self.tag, b, name=self.name, index=self.index)

    def map(self, fn: Callable[[Any], Any]) -> "ValueCtx":
        return self.set_value(fn(self.value))

    def bind(self, fn: Callable[[Any], "ValueCtx"]) -> "ValueCtx":
        return fn(self.value)
