"""F6 — deterministic LaTeX -> plain text normalizer.

The reference's Oreo path runs pylatexenc's ``LatexNodes2Text`` over
every joined text category and stores equation patches raw
(reference oreo.py:147; tensor_utils.py:2405-2418: non-visual keys get
``'\\n'.join -> latex_to_text -> re.sub(r'(\\n\\s*)+', '\\n')``, and a
conversion failure drops that category's key).

This is a dependency-free pylatexenc-*subset* with the same shape:
strip commands keeping operands, map common math macros to unicode,
remove group braces / math delimiters / comments, ``\\\\`` -> newline.
Failure semantics (``LatexError``) mirror the reference's bare
``except`` -> key dropped.

Divergence (documented): text without any backslash is returned
unchanged — real pylatexenc would also strip ``%`` comments and
braces from plain prose, which is destructive on transcript payloads
where ``%`` means percent. The guard keeps the normalizer idempotent
and safe on non-LaTeX text.
"""

from __future__ import annotations

import re


class LatexError(ValueError):
    """Deterministic conversion failure (reference analog: the bare
    except around latex_to_text at tensor_utils.py:2414-2417)."""


_MACRO_RE = re.compile(r"[A-Za-z]+")

_GREEK = {
    "alpha": "α", "beta": "β", "gamma": "γ", "delta": "δ", "epsilon": "ε",
    "zeta": "ζ", "eta": "η", "theta": "θ", "iota": "ι", "kappa": "κ",
    "lambda": "λ", "mu": "μ", "nu": "ν", "xi": "ξ", "pi": "π", "rho": "ρ",
    "sigma": "σ", "tau": "τ", "upsilon": "υ", "phi": "φ", "chi": "χ",
    "psi": "ψ", "omega": "ω",
    "Gamma": "Γ", "Delta": "Δ", "Theta": "Θ", "Lambda": "Λ", "Xi": "Ξ",
    "Pi": "Π", "Sigma": "Σ", "Phi": "Φ", "Psi": "Ψ", "Omega": "Ω",
}

SYMBOLS = {
    **_GREEK,
    "times": "×", "cdot": "·", "pm": "±", "mp": "∓",
    "leq": "≤", "le": "≤", "geq": "≥", "ge": "≥", "neq": "≠", "ne": "≠",
    "approx": "≈", "sim": "∼", "equiv": "≡", "propto": "∝",
    "infty": "∞", "sum": "∑", "prod": "∏", "int": "∫",
    "partial": "∂", "nabla": "∇", "in": "∈", "subset": "⊂", "cup": "∪",
    "cap": "∩", "forall": "∀", "exists": "∃",
    "rightarrow": "→", "to": "→", "leftarrow": "←", "Rightarrow": "⇒",
    "ldots": "…", "dots": "…", "cdots": "⋯", "quad": " ", "qquad": "  ",
    ",": " ", ";": " ", " ": " ",
}


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i] in " \t":
        i += 1
    return i


def _group(s: str, i: int) -> tuple[str, int]:
    """Parse a required brace group at s[i]; return (raw_inner, next_i).

    A macro that *requires* operands (frac/sqrt/begin/end) with no
    group is the deterministic failure case.
    """
    i = _skip_ws(s, i)
    if i >= len(s) or s[i] != "{":
        raise LatexError(f"missing required group at offset {i}")
    depth = 0
    j = i
    n = len(s)
    while j < n:
        c = s[j]
        if c == "\\":
            j += 2
            continue
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return s[i + 1 : j], j + 1
        j += 1
    raise LatexError("unbalanced group")


def _convert(s: str) -> str:
    out: list[str] = []
    env_stack: list[str] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "\\":
            if i + 1 >= n:
                break  # trailing lone backslash: dropped
            nxt = s[i + 1]
            if nxt == "\\":
                out.append("\n")
                i += 2
                continue
            m = _MACRO_RE.match(s, i + 1)
            if m is None:
                # escaped special: \% \$ \{ \} \_ \& \# \, etc.
                out.append(SYMBOLS.get(nxt, nxt))
                i += 2
                continue
            name = m.group(0)
            i = m.end()
            if name == "frac":
                a, i = _group(s, i)
                b, i = _group(s, i)
                out.append(f"{_convert(a)}/{_convert(b)}")
            elif name == "sqrt":
                a, i = _group(s, i)
                out.append(f"√({_convert(a)})")
            elif name == "begin":
                env, i = _group(s, i)
                env_stack.append(env)
            elif name == "end":
                env, i = _group(s, i)
                if not env_stack or env_stack.pop() != env:
                    raise LatexError(f"mismatched \\end{{{env}}}")
            elif name in SYMBOLS:
                out.append(SYMBOLS[name])
            # else: unknown / formatting macro (textbf, mathrm, ...):
            # the command name is dropped; its brace group is handled
            # generically below, so the operand text survives —
            # pylatexenc's keep-operands behavior.
            continue
        if ch == "%":
            j = s.find("\n", i)
            i = n if j == -1 else j  # keep the newline, drop the comment
            continue
        if ch in "{}$":
            i += 1
            continue
        if ch == "~":
            out.append(" ")
            i += 1
            continue
        out.append(ch)
        i += 1
    if env_stack:
        raise LatexError(f"unclosed environment {env_stack[-1]!r}")
    return "".join(out)


# Trigger: conversion runs only when the text contains a KNOWN LaTeX
# construct — a recognized macro name, a line break '\\\\', or an
# escaped special. A stray unknown '\word' (Windows path, regex in
# prose) does NOT trigger, so prose is never destroyed by macro
# deletion / comment stripping / brace removal.
_FORMAT_MACROS = {
    "textbf", "textit", "texttt", "text", "emph", "mathrm", "mathbf",
    "mathit", "mathcal", "mathbb", "mbox", "underline", "overline",
    "hat", "bar", "vec", "tilde", "left", "right", "item", "section",
    "subsection", "title", "author", "label", "cite", "ref",
}
_KNOWN_MACROS = sorted(
    (set(SYMBOLS) - set(",; ")) | _FORMAT_MACROS | {"frac", "sqrt", "begin", "end"},
    key=len, reverse=True,
)
_TRIGGER_RE = re.compile(
    r"\\\\|\\[%&$#_{}]|\\(?:" + "|".join(_KNOWN_MACROS) + r")(?![A-Za-z])"
)


def latex_to_text(text: str) -> str:
    """Convert LaTeX-bearing text to plain text; identity on text with
    no recognized LaTeX construct (guard, see _TRIGGER_RE — an unknown
    '\\word' alone never activates conversion). Raises LatexError on
    malformed required structure (missing \\frac operand, unbalanced
    environment) — callers drop the affected key, matching the
    reference's failure handling."""
    if "\\" not in text or not _TRIGGER_RE.search(text):
        return text
    return _convert(text)
