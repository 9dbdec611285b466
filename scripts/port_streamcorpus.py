#!/usr/bin/env python3
"""Port the reference's STEP-WISE streaming fixtures into
src/main/resources/streamcorpus/<suite>.txt.

The upstream material is the reference compiler's streaming golden
tests (sql-to-dbsp-compiler .../compiler/sql/streaming/*.java and the
step-using tests in simple/ and the root sql/ package). Each test
compiles one program (CREATE TABLE ... / CREATE VIEW ...) and then
drives it with `ccs.step(script, expected)` calls, where `expected`
records the OUTPUT DELTA of the program's single output view for that
step — value columns plus a trailing `weight` column. This script
extracts only SQL fixtures and recorded deltas — test DATA, not
engine code.

Output format per suite file:
  == UNIT <method>[/trim]
  == PROGRAM
  <program sql>
  == STEP
  <insert/remove script (possibly empty)>
  == EXPECT
  <expected delta table: header, ---- separator, rows with weights>
  [== STEP ... == EXPECT ... repeated]

Only methods where the program and every step argument are literal
(text block or string) are ported; methods driving programmatic
Change objects, loops, or multi-output streams are skipped.
"""
import re
import pathlib

REF = pathlib.Path("/root/reference/sql-to-dbsp-compiler/SQL-compiler/"
                   "src/test/java/org/dbsp/sqlCompiler/compiler/sql")
OUT = pathlib.Path(__file__).resolve().parent.parent / \
    "src/main/resources/streamcorpus"


def unescape_java(t: str) -> str:
    out = []
    i = 0
    esc = {"\\": "\\", '"': '"', "'": "'", "t": "\t", "n": "\n",
           "r": "\r", "f": "\f", "b": "\b", "s": " "}
    while i < len(t):
        c = t[i]
        if c == "\\" and i + 1 < len(t) and t[i + 1] == "\n":
            i += 2
        elif c == "\\" and i + 1 < len(t) and t[i + 1] in esc:
            out.append(esc[t[i + 1]])
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def strip_indent(block: str) -> str:
    lines = block.split("\n")
    indents = [len(l) - len(l.lstrip()) for l in lines if l.strip()]
    if not indents:
        return block
    cut = min(indents)
    return "\n".join(l[cut:] if len(l) >= cut else l for l in lines)


def strip_block_comments(src: str) -> str:
    out = []
    i = 0
    in_tb = False
    while i < len(src):
        if src.startswith('"""', i):
            in_tb = not in_tb
            out.append('"""')
            i += 3
        elif not in_tb and src.startswith("/*", i):
            end = src.find("*/", i + 2)
            i = len(src) if end < 0 else end + 2
        else:
            out.append(src[i])
            i += 1
    return "".join(out)


def parse_literal(src: str, i: int):
    """Parse a Java string literal (text block or plain) starting at a
    position at-or-after i (skipping whitespace). Returns (value, end)
    or None if the next token is not a literal."""
    while i < len(src) and src[i] in " \t\n\r":
        i += 1
    if src.startswith('"""', i):
        end = src.find('"""', i + 3)
        if end < 0:
            return None
        raw = src[i + 3:end]
        if raw.startswith("\n"):
            raw = raw[1:]
        return unescape_java(strip_indent(raw)).rstrip(), end + 3
    if i < len(src) and src[i] == '"':
        j = i + 1
        buf = []
        while j < len(src):
            c = src[j]
            if c == "\\" and j + 1 < len(src):
                buf.append(src[j:j + 2])
                j += 2
                continue
            if c == '"':
                return unescape_java("".join(buf)), j + 1
            buf.append(c)
            j += 1
        return None
    return None


def weight_one(expected: str) -> str:
    """stepWeightOne: append `| 1` to each data row (the Java helper's
    exact transformation)."""
    lines = expected.split("\n")
    in_header = True
    for i, l in enumerate(lines):
        if in_header and "---" in l:
            in_header = False
            continue
        if in_header:
            continue
        lines[i] = l + "| 1"
    return "\n".join(lines)


def extract_method(name: str, body: str):
    """Returns a list of (program, trim, [(script, expected), ...])
    segments — one per getCCS call (a method may drive SEVERAL
    programs, e.g. WindowTests testRankDescending) — or a skip reason
    string. A non-portable segment skips just that segment."""
    ccs_matches = list(re.finditer(r"\.getCCS\s*\(", body))
    if not ccs_matches:
        return "no getCCS"
    if ".addChange(" in body or "new Change(" in body \
            or "new InputOutputChange(" in body:
        return "programmatic Change steps"
    if re.search(r"\bfor\s*\(", body):
        return "loop-driven steps"
    trim = ".withStringTrim()" in body
    segments = []
    for idx, cm in enumerate(ccs_matches):
        seg_end = (ccs_matches[idx + 1].start()
                   if idx + 1 < len(ccs_matches) else len(body))
        lit = parse_literal(body, cm.end())
        if lit and re.match(r"\s*\+", body[lit[1]:]):
            continue  # concatenated (non-literal) program
        if lit:
            program = lit[0]
        else:
            var_m = re.match(r"\s*(\w+)\s*[,)]", body[cm.end():])
            if not var_m:
                continue  # non-literal segment
            var = var_m.group(1)
            decls = [d for d in re.finditer(
                r"(?:String\s+|var\s+)?" + var + r'\s*=\s*"""', body)
                if d.start() < cm.start()]
            if not decls:
                continue
            lit = parse_literal(body, decls[-1].end() - 3)
            if not lit or re.match(r"\s*\+", body[lit[1]:]):
                continue  # concatenated (non-literal) program
            program = lit[0]
        if re.search(r"getCCS\s*\(\s*\w+\s*,", body[cm.start():cm.end() + 40]):
            continue  # multi-output stream
        if re.search(r"(?i)\bNOW\s*\(\)", program):
            continue  # nondeterministic replay
        steps = []
        bad = False
        for m in re.finditer(r"\.step(WeightOne)?\s*\(",
                             body[cm.end():seg_end]):
            w1 = m.group(1) is not None
            lit1 = parse_literal(body, cm.end() + m.end())
            if not lit1:
                bad = True
                break
            script, p = lit1
            cm2 = re.match(r"\s*,", body[p:])
            if not cm2:
                bad = True
                break
            lit2 = parse_literal(body, p + cm2.end())
            if not lit2:
                bad = True
                break
            expected, _ = lit2
            if w1:
                expected = weight_one(expected)
            steps.append((script, expected))
        if bad or not steps:
            continue
        segments.append((program, trim, steps))
    if not segments:
        return "no portable text-step segments"
    return segments


def methods(src: str):
    src = strip_block_comments(src)
    for m in re.finditer(
            r'((?:@\w+(?:\((?:"[^"]*"|[^)"])*\))?\s*)*)'
            r"public void (\w+)\(\)\s*\{(.*?)\n    \}",
            src, re.DOTALL):
        yield m.group(1), m.group(2), m.group(3)


def port(java_rel, suite: str, skip=()):
    files = [java_rel] if isinstance(java_rel, str) else list(java_rel)
    out = [f"-- streamcorpus suite: {suite}",
           "-- provenance: the reference compiler's streaming golden "
           "tests (step-wise recorded output deltas)"]
    out += [f"--   sql-to-dbsp-compiler/.../compiler/sql/{f}"
            for f in files]
    out.append("-- ported as test fixtures (programs + step scripts + "
               "recorded per-step deltas); see StreamCorpus.scala")
    n_units, n_steps = 0, 0
    skipped = {}
    for f in files:
        src = (REF / f).read_text()
        for annotations, name, body in methods(src):
            if "@Ignore" in annotations:
                skipped[name] = "@Ignore"
                continue
            if name in skip:
                skipped[name] = "explicit skip"
                continue
            r = extract_method(name, body)
            if isinstance(r, str):
                skipped[name] = r
                continue
            for k, (program, trim, steps) in enumerate(r):
                uid = name if k == 0 else f"{name}.{k}"
                out.append(f"== UNIT {uid}" + ("/trim" if trim else ""))
                out.append("== PROGRAM")
                out.append(program)
                for script, expected in steps:
                    out.append("== STEP")
                    out.append(script)
                    out.append("== EXPECT")
                    out.append(expected)
                    n_steps += 1
                n_units += 1
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / f"{suite}.txt").write_text("\n".join(out) + "\n")
    by_reason = {}
    for n, r in skipped.items():
        by_reason.setdefault(r, []).append(n)
    print(f"{suite}: {n_units} units / {n_steps} steps; "
          f"{len(skipped)} methods not ported:")
    for r, ns in sorted(by_reason.items(), key=lambda kv: -len(kv[1])):
        print(f"  [{len(ns):3d}] {r}: {', '.join(ns[:6])}"
              + (" ..." if len(ns) > 6 else ""))


if __name__ == "__main__":
    port("streaming/StreamingTests.java", "streaming")
    port("WindowTests.java", "windowstep")
    port("simple/IncrementalRegressionTests.java", "increg")
    port("simple/IncrementalRegression2Tests.java", "increg2")
    # round-15 extension: every remaining step-using file — the
    # recursive step tests plus the misc regression/function files
    port("recursive/IncrementalRecursiveTests.java", "increc")
    port(["simple/RegressionTests.java", "simple/Regression1Tests.java",
          "simple/OuterJoinTests.java", "simple/InternTests.java",
          "functions/FunctionsTest.java"], "miscstep")
