"""Shared HLO written-bytes census helpers (round-4 methodology).

Given a TPU-compiled HLO module's text, attribute each instruction's
WRITTEN bytes (its result-shape size) to a category:

  * fusions whose called computation contains a convolution/dot
    ("compute fusions" — epilogues absorbed into MXU work),
  * standalone elementwise fusions (separate HBM passes),
  * copies (relayouts),
  * bare convolution/dot instructions,
  * other data movement (reduce/sort/scatter/gather/transpose/...).

Excess bytes in compute-bound ops overlap MXU time and are ~free; the
standalone elementwise + copy categories are the ones that cost wall
time (PERF.md round-4 TransUNet census: the dot-output-dtype fix cut
4.16 GB of writes and moved wall time not at all).
"""

import re

_SHAPE = re.compile(r"(bf16|f32|f16|s32|s8|u8|pred|u32)\[([0-9,]*)\]")
_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "s8": 1, "u8": 1,
          "pred": 1, "u32": 4}


def shape_bytes(type_str):
    tot = 0
    for m in _SHAPE.finditer(type_str):
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        tot += n * _BYTES[m.group(1)]
    return tot


def census(txt):
    """{category: [bytes_written, instr_count]} for one HLO module text."""
    comps = {}
    for m in re.finditer(r"^%?([\w.\-]+) (?:\([^)]*\) -> [^{]+)?\{", txt, re.M):
        comps[m.group(1)] = txt[m.end():txt.find("\n}", m.end())]
    cats = {"conv/dot fusions": [0, 0], "elementwise fusions": [0, 0],
            "copies": [0, 0], "bare conv/dot": [0, 0],
            "other (reduce/sort/...)": [0, 0]}
    for m in re.finditer(r"= ((?:\([^)]*\)|\S+)) fusion\([^\n]*calls=%?([\w.\-]+)", txt):
        rb = shape_bytes(m.group(1))
        body = comps.get(m.group(2), "")
        key = ("conv/dot fusions" if ("convolution(" in body
                                      or re.search(r"= \S+ dot\(", body))
               else "elementwise fusions")
        cats[key][0] += rb
        cats[key][1] += 1
    for m in re.finditer(r"= ((?:\([^)]*\)|\S+)) copy\(", txt):
        cats["copies"][0] += shape_bytes(m.group(1))
        cats["copies"][1] += 1
    for m in re.finditer(r"= ((?:\([^)]*\)|\S+)) (?:convolution|dot)\(", txt):
        cats["bare conv/dot"][0] += shape_bytes(m.group(1))
        cats["bare conv/dot"][1] += 1
    for m in re.finditer(
        r"= ((?:\([^)]*\)|\S+)) (reduce|sort|scatter|gather|transpose|reshape|concatenate)\(",
        txt,
    ):
        cats["other (reduce/sort/...)"][0] += shape_bytes(m.group(1))
        cats["other (reduce/sort/...)"][1] += 1
    return cats


def top_shapes(txt, pattern, n=12):
    """[(count, shape, bytes_total)] for instruction results matching
    ``pattern`` (e.g. r"copy\\(" or r"fusion\\(")."""
    import collections

    c = collections.Counter()
    for m in re.finditer(r"= ((?:\([^)]*\)|\S+)) " + pattern, txt):
        c[m.group(1)] += 1
    rows = [(cnt, shape, cnt * shape_bytes(shape)) for shape, cnt in c.items()]
    return sorted(rows, key=lambda r: -r[2])[:n]


def print_census(txt, label=""):
    print(f"written-bytes census {label}(result shapes):")
    for k, (b, c) in census(txt).items():
        print(f"  {k:<24} {b/1e9:7.2f} GB written in {c:4d} instrs")
