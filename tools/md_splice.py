"""Shared marker-delimited markdown splicing for the compare tools.

bench_compare.py and suite_scale_compare.py each maintain one generated
block inside STRESS.md between their own begin/end markers; the replace /
append / partial-edit-repair rules must behave identically in both (review
r15 extracted this from two near-verbatim copies).
"""
import sys


def splice_block(path, block, mark_begin, mark_end):
    """Replace the marker-delimited block in `path` with `block` (which
    must include the markers), appending it if no markers exist yet.
    Exits loudly on a half-edited file (one marker without the other) —
    re-splicing such a file would duplicate blocks."""
    with open(path) as f:
        text = f.read()
    has_b, has_e = mark_begin in text, mark_end in text
    if has_b != has_e:
        sys.exit(f"{path} has one marker but not the other (partial "
                 "edit?) — repair the markers by hand first, or "
                 "re-splicing would duplicate blocks")
    if has_b:
        pre = text[:text.index(mark_begin)]
        post = text[text.index(mark_end) + len(mark_end):]
        text = pre + block + post
    else:
        text = text.rstrip("\n") + "\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(text)
