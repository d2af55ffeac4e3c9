"""ftfy stand-in: only text cleanup for CLIP tokenization paths, which the
parity harness never exercises."""


def fix_text(text, **kw):
    return text
