"""Alert-message template compiler: the reference's Jinja template
subset compiled to a single Catalyst ``concat`` expression.

The reference renders alert messages through Jinja2
(util/__init__.py:549-560: ``get_template('alerts/<name>/<channel>')``,
``template.render(data=data)``) with templates that use exactly four
constructs (country_config/templates/alerts/*/{text,sms,html}):

1. literal text between tags (including hermes-side ``<<country>>`` /
   ``<<id>>`` placeholders, which pass through VERBATIM — the messaging
   service substitutes them after publish);
2. ``{{_('...')}}`` — gettext of a literal; the default locale's gettext
   is the identity, so this compiles to the literal itself;
3. ``{{data.get("key", "default")}}`` (optionally wrapped in ``_()``) —
   a data lookup with fallback, compiled to
   ``coalesce(lookup(key), lit(default))``;
4. ``{{_('fmt %(name)s')|format(name=_('literal'))}}`` — a %-format
   whose arguments are themselves literals, FOLDED at compile time.

Because the subset is closed over literals except for ``data.get``,
every template compiles to ``concat(lit, coalesce(col, lit), lit, ...)``
— one whole-stage-codegen projection per channel, no Python in the row
path.  Anything outside the subset raises at compile time (loudly wrong
beats silently mis-rendered).  tests/test_template_parity.py proves
byte-identical output against Jinja2 itself over the reference's real
template files.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

_TAG = re.compile(r"\{\{(.*?)\}\}", re.DOTALL)

# _('...') / _("...") with backslash escapes
_LIT = re.compile(r"^_\(\s*('((?:[^'\\]|\\.)*)'|\"((?:[^\"\\]|\\.)*)\")\s*\)$")
_DATA = re.compile(
    r"^data\.get\(\s*('((?:[^'\\]|\\.)*)'|\"((?:[^\"\\]|\\.)*)\")\s*"
    r"(?:,\s*('((?:[^'\\]|\\.)*)'|\"((?:[^\"\\]|\\.)*)\")\s*)?\)$"
)
_FMT = re.compile(r"^(_\(.*?\))\s*\|\s*format\((.*)\)$", re.DOTALL)
_KWARG = re.compile(r"\s*(\w+)\s*=\s*(_\(\s*(?:'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\")\s*\))\s*(?:,|$)")


def _unescape(quoted: str) -> str:
    """The string inside a matched quote pair, backslash escapes applied
    (the templates use ``\\'`` inside single-quoted gettext calls)."""
    body = quoted[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


def _gettext_literal(expr: str) -> str | None:
    m = _LIT.match(expr)
    if not m:
        return None
    return _unescape(m.group(1))


class TemplateError(ValueError):
    """An expression outside the supported reference-template subset."""


def parse_template(source: str) -> list[tuple[str, str, str | None]]:
    """Tokenize a template into ``("lit", text, None)`` and
    ``("data", key, default)`` segments; compile-time-foldable gettext
    and format expressions come back as ``"lit"`` segments."""
    # Jinja's keep_trailing_newline defaults to False (and the
    # reference's Environment leaves it there): one trailing newline of
    # the template FILE is not part of the rendered output.
    if source.endswith("\n"):
        source = source[:-1]
    # Only {{ ... }} expression tags are in the supported subset.  Jinja
    # statement ({% %}) and comment ({# #}) tags would otherwise pass
    # through VERBATIM into rendered alert messages (ADVICE r9 #3) —
    # anything outside the subset must raise at compile time, as
    # documented.  The check runs on the LITERAL segments between
    # expression tags, not the whole source: '{%' inside a supported
    # gettext string literal (e.g. {{_('100{%}')}} ) is data, exactly as
    # Jinja's lexer treats it.
    def _reject_jinja_tags(literal: str) -> str:
        for tag in ("{%", "{#"):
            if tag in literal:
                raise TemplateError(
                    f"unsupported Jinja tag {tag!r} in template (only "
                    "{{ ... }} expressions are in the compiled subset)"
                )
        return literal

    out: list[tuple[str, str, str | None]] = []
    pos = 0
    for m in _TAG.finditer(source):
        if m.start() > pos:
            out.append(("lit", _reject_jinja_tags(source[pos:m.start()]), None))
        expr = m.group(1).strip()
        seg = _parse_expr(expr)
        out.append(seg)
        pos = m.end()
    if pos < len(source):
        out.append(("lit", _reject_jinja_tags(source[pos:]), None))
    # fold adjacent literals so the compiled concat stays small
    folded: list[tuple[str, str, str | None]] = []
    for seg in out:
        if folded and seg[0] == "lit" and folded[-1][0] == "lit":
            folded[-1] = ("lit", folded[-1][1] + seg[1], None)
        else:
            folded.append(seg)
    return folded


def _parse_expr(expr: str) -> tuple[str, str, str | None]:
    lit = _gettext_literal(expr)
    if lit is not None:
        return ("lit", lit, None)
    fmt = _FMT.match(expr)
    if fmt:
        base = _gettext_literal(fmt.group(1).strip())
        if base is None:
            raise TemplateError(f"unsupported format base: {expr!r}")
        kwargs: dict[str, str] = {}
        rest = fmt.group(2)
        # Anchored kwarg scan (ADVICE r9 #3): each match must start where
        # the previous one ended, so an unparseable argument BETWEEN two
        # valid ones raises instead of being silently skipped (finditer
        # would hop over it and resume at the next parseable kwarg).
        consumed = 0
        while consumed < len(rest) and rest[consumed:].strip():
            km = _KWARG.match(rest, consumed)
            if km is None:
                raise TemplateError(f"unparsed format arguments: {expr!r}")
            val = _gettext_literal(km.group(2).strip())
            if val is None:
                raise TemplateError(f"unsupported format argument: {expr!r}")
            kwargs[km.group(1)] = val
            consumed = km.end()
        return ("lit", base % kwargs, None)
    inner = expr
    m = re.match(r"^_\((.*)\)$", expr, re.DOTALL)
    if m and _DATA.match(m.group(1).strip()):
        inner = m.group(1).strip()
    dm = _DATA.match(inner)
    if dm:
        key = _unescape(dm.group(1))
        default = _unescape(dm.group(4)) if dm.group(4) is not None else None
        return ("data", key, default)
    raise TemplateError(f"unsupported template expression: {expr!r}")


def compile_template(
    source: str, lookup: Callable[[str], Column]
) -> Column:
    """Compile a template to ONE Column: ``concat`` of literal chunks and
    ``coalesce(lookup(key) AS STRING, default)`` lookups.  ``lookup``
    maps a data key to its source column (the caller decides how the
    reference's ``data`` dict fields map onto the alert DataFrame);
    missing/NULL values render as the template's own default, matching
    ``dict.get``."""
    parts: list[Column] = []
    for kind, a, b in parse_template(source):
        if kind == "lit":
            parts.append(F.lit(a))
        else:
            col = lookup(a).cast("string")
            parts.append(F.coalesce(col, F.lit(b if b is not None else "None")))
    if not parts:
        return F.lit("")
    return F.concat(*parts)
