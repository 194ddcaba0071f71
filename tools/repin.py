#!/usr/bin/env python3
"""Apply a repin.json proposal (written by graft.Verify when it detects a
regenerated fixture) to the source pins, so the gate pins are unenforced for
ONE verify run instead of one round.

Usage: python3 tools/repin.py <repin.json> [srcRoot=src/main/scala]

Rewrites, in place:
  - every `.expectAtGate(<rows>L, "<checksum>")` (or rows-only form) that
    follows the named query's registration, with the freshly measured values;
  - `pinnedFixtureFp` in graft/Verify.scala with the new fingerprint.

Then: sbt compile && rerun Verify — gate_checks must show every pin enforced.
The script is conservative: it locates `"<name>" ->` and patches only the
FIRST .expectAtGate before the next `"q_...` registration; any name it cannot
locate (or locates ambiguously) is reported and left untouched.
"""
import json, re, sys, glob


def patch_pin(text: str, name: str, rows: int, checksum):
    reg = re.search(r'"%s"\s*->' % re.escape(name), text)
    if not reg:
        return None, "registration not found"
    nxt = re.search(r'"q_[a-z0-9_]+"\s*->', text[reg.end():])
    window_end = reg.end() + (nxt.start() if nxt else len(text) - reg.end())
    window = text[reg.end():window_end]
    m = re.search(r'\.expectAtGate\(\s*(\d+)L\s*(?:,\s*"(\d+)")?\s*\)', window)
    if not m:
        return None, "no .expectAtGate in this registration"
    new_call = (f'.expectAtGate({rows}L, "{checksum}")' if checksum is not None
                else f'.expectAtGate({rows}L)')
    patched = (text[:reg.end()] + window[:m.start()] + new_call +
               window[m.end():] + text[window_end:])
    return patched, None


def main():
    repin_path = sys.argv[1]
    src_root = sys.argv[2] if len(sys.argv) > 2 else "src/main/scala"
    repin = json.load(open(repin_path))
    files = {p: open(p).read() for p in glob.glob(f"{src_root}/**/*.scala",
                                                  recursive=True)}
    unapplied = []
    for name, pin in sorted(repin["pins"].items()):
        hits = [p for p, t in files.items() if re.search(
            r'"%s"\s*->' % re.escape(name), t)]
        if len(hits) != 1:
            unapplied.append((name, f"{len(hits)} files register it"))
            continue
        patched, err = patch_pin(files[hits[0]], name,
                                 pin["rows"], pin.get("checksum"))
        if err:
            unapplied.append((name, err))
        else:
            files[hits[0]] = patched
            print(f"  repinned {name}: rows={pin['rows']}")
    fp = repin.get("fixture_fp", "")
    verify = f"{src_root}/graft/Verify.scala"
    if fp and verify in files:
        files[verify], n = re.subn(r'(val pinnedFixtureFp = ")[0-9a-f]+(")',
                                   r'\g<1>%s\g<2>' % fp, files[verify])
        print(f"  fingerprint -> {fp}" if n == 1 else
              "  WARNING: pinnedFixtureFp not patched")
    for p, t in files.items():
        open(p, "w").write(t)
    if unapplied:
        print("NOT applied (patch by hand):")
        for name, why in unapplied:
            print(f"  {name}: {why}")
        sys.exit(1)
    print("all pins applied — recompile and rerun Verify to re-enforce")


if __name__ == "__main__":
    main()
