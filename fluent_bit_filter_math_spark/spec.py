"""Logical spec for the math-fold operator — the engine's "query language".

Mirrors the reference's config contract (``configure``,
/root/reference/filter_math/math.c:37-132) as a validated dataclass:

* ``operation`` resolved by 3-character case-insensitive prefix match
  (math.c:54-66: ``strncasecmp(kv->val, OPERATION_STRING[i], 3)``), so
  ``"subtract"``, ``"SUBTRACTION"`` and ``"sub"`` all mean SUB.
* operands are an *ordered* list of record fields and integer constants
  (order preserved — mk_list tail-append at math.c:87,105; evaluation is a
  left fold head→tail, math.c:179-192).
* constants are strtod-parsed then truncated toward zero to int, and a
  constant that truncates to 0 is rejected (math.c:99-103).
* ``output_field`` is required (math.c:115-118); ≥2 operands required
  (math.c:126-129); unknown config keys are a hard error (math.c:108-111).

Divergences from the reference, on purpose (SURVEY.md §1.2):
* operands carry an explicit tagged type (the reference leaves
  ``operand->field`` uninitialized for constants — C UB, math.c:91-106);
* writing an existing output field overwrites instead of producing a
  duplicate msgpack map key (math.c:245-262);
* division-by-zero semantics are selectable: ``div_mode="null"`` (SQL
  NULL, matches Spark/DuckDB default) or ``div_mode="ieee"`` (±inf/NaN,
  matches the reference's C double division, math.c:212-215).
"""

from __future__ import annotations

import enum
import re
from dataclasses import dataclass, field
from typing import Iterable, Sequence, Union


class SpecError(ValueError):
    """Raised for any invalid spec — the analogue of configure() returning -1."""


class Operation(enum.Enum):
    SUM = "sum"
    SUB = "sub"
    MUL = "mul"
    DIV = "div"

    @classmethod
    def resolve(cls, name: str) -> "Operation":
        """3-char case-insensitive prefix match (math.c:54-66)."""
        if not isinstance(name, str) or len(name) < 3:
            raise SpecError(f"invalid operation {name!r}")
        prefix = name[:3].lower()
        for op in cls:
            if op.value[:3] == prefix:
                return op
        raise SpecError(f"invalid operation {name!r}")


@dataclass(frozen=True)
class FieldOperand:
    """An operand read from the record; missing/non-numeric coerce to 0.0
    with case-insensitive key match (math.c:146-165)."""

    name: str


@dataclass(frozen=True)
class ConstOperand:
    """A config-time integer literal (math.c:90-107: strtod → int truncation,
    zero rejected)."""

    value: int

    def __post_init__(self) -> None:
        if self.value == 0:
            raise SpecError(
                "Constant should be an integer value (different than 0)"
            )


Operand = Union[FieldOperand, ConstOperand]

# strtod semantics: parse the longest valid numeric prefix; no prefix → 0.0.
_STRTOD_RE = re.compile(
    r"^\s*[+-]?(?:inf(?:inity)?|nan|0[xX][0-9a-fA-F]+"
    r"|(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)"
)


def _strtod(text: str) -> float:
    m = _STRTOD_RE.match(text)
    if not m:
        return 0.0
    token = m.group(0).strip()
    # Detect hex AFTER stripping the sign — C strtod parses '-0x10' to -16
    # (the old prefix check compared against the sign character; ADVICE r1).
    if token.lstrip("+-")[:2].lower() == "0x":
        try:
            return float(int(token, 16))
        except ValueError:
            return 0.0
    return float(token)


def parse_constant(raw: str) -> ConstOperand:
    """strtod then truncate toward zero; 0 is rejected (math.c:99-103).

    inf/nan parse fine under strtod but cannot truncate to a C int — they
    surface as SpecError like every other configure()-analogue rejection,
    not as a raw OverflowError/ValueError (ADVICE r1).
    """
    try:
        value = int(_strtod(raw))  # truncates toward zero, like the C cast
    except (OverflowError, ValueError) as exc:
        raise SpecError(
            f"Constant {raw!r} does not truncate to an integer: {exc}"
        ) from None
    return ConstOperand(value)  # ConstOperand rejects 0


@dataclass(frozen=True)
class MathSpec:
    operation: Operation
    operands: tuple[Operand, ...]
    output_field: str
    cast_to_int: bool = False
    div_mode: str = "null"  # "null" | "ieee"

    def __post_init__(self) -> None:
        if not self.output_field:
            raise SpecError("'output_field' is mandatory")
        if len(self.operands) < 2:
            raise SpecError("At least two operands (fields/constants) are required")
        if self.div_mode not in ("null", "ieee"):
            raise SpecError(f"div_mode must be 'null' or 'ieee', got {self.div_mode!r}")
        for op in self.operands:
            if not isinstance(op, (FieldOperand, ConstOperand)):
                raise SpecError(f"invalid operand {op!r}")

    # ------------------------------------------------------------------
    # The fluent-bit-style KV-properties front end (configure, math.c:37-132)
    # ------------------------------------------------------------------
    _KNOWN_KEYS = frozenset(
        {"operation", "field", "constant", "output_field", "cast_to_int", "div_mode"}
    )
    _TRUE = frozenset({"true", "on", "yes", "1"})
    _FALSE = frozenset({"false", "off", "no", "0"})

    @classmethod
    def from_properties(
        cls, properties: Iterable[tuple[str, str]], *, div_mode: str = "null"
    ) -> "MathSpec":
        """Build a spec from an ordered key/value property list.

        Repeated ``field`` / ``constant`` keys accumulate in order, exactly
        like the reference's mk_list (math.c:75-107). Unknown keys raise
        (math.c:108-111).
        """
        operation: Operation | None = None
        output_field: str | None = None
        cast_to_int = False
        operands: list[Operand] = []
        for key, value in properties:
            k = key.strip().lower()
            if k == "operation":
                operation = Operation.resolve(value)
            elif k == "field":
                operands.append(FieldOperand(value))
            elif k == "constant":
                operands.append(parse_constant(value))
            elif k == "output_field":
                output_field = value
            elif k == "cast_to_int":
                v = value.strip().lower()
                if v in cls._TRUE:
                    cast_to_int = True
                elif v in cls._FALSE:
                    cast_to_int = False
                else:
                    raise SpecError(f"invalid boolean {value!r} for cast_to_int")
            elif k == "div_mode":
                div_mode = value.strip().lower()
            else:
                raise SpecError(f"Invalid configuration key {key!r}")
        if output_field is None:
            raise SpecError("'output_field' is mandatory")
        if operation is None:
            raise SpecError("'operation' is mandatory")
        return cls(
            operation=operation,
            operands=tuple(operands),
            output_field=output_field,
            cast_to_int=cast_to_int,
            div_mode=div_mode,
        )

    @classmethod
    def build(
        cls,
        operation: str,
        operands: Sequence[Union[str, int, Operand]],
        output_field: str,
        *,
        cast_to_int: bool = False,
        div_mode: str = "null",
    ) -> "MathSpec":
        """Convenience constructor: strings are fields, ints are constants."""
        resolved: list[Operand] = []
        for op in operands:
            if isinstance(op, (FieldOperand, ConstOperand)):
                resolved.append(op)
            elif isinstance(op, str):
                resolved.append(FieldOperand(op))
            elif isinstance(op, int):
                resolved.append(ConstOperand(op))
            else:
                raise SpecError(f"invalid operand {op!r}")
        return cls(
            operation=Operation.resolve(operation),
            operands=tuple(resolved),
            output_field=output_field,
            cast_to_int=cast_to_int,
            div_mode=div_mode,
        )
