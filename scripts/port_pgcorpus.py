#!/usr/bin/env python3
"""Port PostgreSQL-regression-derived conformance fixtures into
src/test/resources/pgcorpus/<suite>.txt.

The upstream material is PostgreSQL's own regression suite (e.g.
postgres/src/test/regress/expected/window.out), as adapted by the
reference compiler's golden tests (sql-to-dbsp-compiler
.../compiler/sql/postgres/*.java). This script extracts only the SQL
fixtures and their recorded expected outputs — test DATA, not engine
code — and stamps each file with its provenance.

Output format per suite file:
  == SETUP
  <DDL + INSERT statements>
  == TEST <method>[/sorted][/trim] <n>
  <query;>
  <expected .out block (header, ----, rows, "(N rows)")>

Only q/qs/qst blocks from non-@Ignore'd methods are ported (qf blocks
test error messages, which are engine-specific).
"""
import re
import sys
import pathlib

REF = pathlib.Path("/root/reference/sql-to-dbsp-compiler/SQL-compiler/"
                   "src/test/java/org/dbsp/sqlCompiler/compiler/sql/postgres")
OUT = pathlib.Path(__file__).resolve().parent.parent / \
    "src/main/resources/pgcorpus"

TEXTBLOCK = re.compile(r'"""\n?(.*?)"""', re.DOTALL)


def unescape_java(t: str) -> str:
    """Process Java text-block escapes the extractor reads raw from
    source: the corpus's runtime text is what the tests actually ran."""
    out = []
    i = 0
    esc = {"\\": "\\", '"': '"', "'": "'", "t": "\t", "n": "\n",
           "r": "\r", "f": "\f", "b": "\b", "s": " "}
    while i < len(t):
        c = t[i]
        if c == "\\" and i + 1 < len(t) and t[i + 1] == "\n":
            i += 2  # text-block line continuation: join lines
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
    """Remove Java /* */ block comments OUTSIDE text blocks (a commented-
    out test method would otherwise be extracted as live units)."""
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


def extract(java_path: pathlib.Path, include_ignored=False):
    src = strip_block_comments(java_path.read_text())
    # split into method chunks: keep (annotations, name, body-with-calls)
    setup = []
    tests = []  # (method, mode, block)
    # prepareInputs text blocks
    prep = re.search(
        r"prepareInputs\s*\([^)]*\)\s*\{(.*?)\n    \}", src, re.DOTALL)
    if prep:
        body = prep.group(1)
        blocks = [strip_indent(m.group(1)).strip()
                  for m in TEXTBLOCK.finditer(body)]
        # single-line Java string literals may carry DDL alongside the
        # text blocks (e.g. Int4's createTable variable); lines calling
        # insertFromResource are excluded so resource names don't leak in
        def cut_comment(line):
            # drop // comments (their bodies quote SQL fragments that
            # would otherwise leak into the literal scan), quote-aware
            inq = False
            i = 0
            while i < len(line):
                c = line[i]
                if c == '"' and (i == 0 or line[i - 1] != "\\"):
                    inq = not inq
                elif not inq and line.startswith("//", i):
                    return line[:i]
                i += 1
            return line
        body2 = "\n".join(cut_comment(l)
                          for l in TEXTBLOCK.sub("", body).split("\n")
                          if "insertFromResource" not in l)
        # Java int-constant splices ("...(" + WIDTH + ",10)") — inline
        # the known constants so the literal join stays contiguous
        body2 = re.sub(r'"\s*\+\s*WIDTH\s*\+\s*"', "38", body2)
        lits = re.findall(r'"((?:[^"\\]|\\.)*)"', body2)
        joined = "".join(lits)
        joined = joined.replace("\\n", "\n").replace("\\t", "\t") \
            .replace('\\"', '"').replace("\\\\", "\\").strip()
        if joined and ("CREATE" in joined.upper()
                       or "INSERT" in joined.upper()):
            setup.append(joined if joined.endswith(";") else joined + ";")
        # some DDL text blocks lack a trailing ';' (statements are
        # submitted separately upstream); terminate for our splitter
        setup.extend(b if b.rstrip().endswith(";") else b + ";"
                     for b in blocks)
        # insertFromResource("t", ...) pulls t.csv (tab-separated, the
        # Postgres tenk1-derived data) into INSERT statements
        body_nc = "\n".join(l for l in body.split("\n")
                             if not l.strip().startswith("//"))
        for m2 in re.finditer(r'insertFromResource\("(\w+)"', body_nc):
            table = m2.group(1)
            csv = (REF.parent.parent.parent.parent.parent.parent.parent
                   / "resources" / f"{table}.csv")
            rows = []
            for line in csv.read_text().strip().split("\n"):
                fields = "', '".join(line.split("\t"))
                rows.append(f"INSERT INTO {table} VALUES('{fields}');")
            setup.append("\n".join(rows))
    # test methods
    # annotation args may contain parens inside string literals
    # (@Ignore("... (generates LATERAL)")) — match quoted runs whole
    for m in re.finditer(
            r'((?:@\w+(?:\((?:"[^"]*"|[^)"])*\))?\s*)*)'
            r"public void (\w+)\(\)\s*\{(.*?)\n    \}",
            src, re.DOTALL):
        annotations, name, body = m.group(1), m.group(2), m.group(3)
        if "@Ignore" in annotations and not include_ignored:
            continue
        for call in re.finditer(
                r"this\.(qst|qs|q|qf)\s*\(\s*\"\"\"\n?(.*?)\"\"\"",
                body, re.DOTALL):
            kind = call.group(1)
            if kind == "qf":
                continue  # error-message tests are engine-specific
            block = strip_indent(call.group(2)).rstrip()
            mode = "sorted"  # DBSP compare is multiset for q and qs alike
            trim = "/trim" if kind == "qst" else ""
            tests.append((name, kind, mode + trim, block))
    return setup, tests


def split_qs_block(block: str):
    """Split a qs-style block into (query, expected) units. Units are
    separated by blank lines, but a blank line can ALSO be an empty-
    string/NULL result row — so parts are merged until each unit ends
    with its '(N rows)' fence."""
    units = []
    cur = []
    # exact empty-line separator: a " " line is DATA (an empty cell)
    for part in re.split(r"\n\n", block):
        if not part.strip():
            if cur:
                cur.append(part)
            continue
        cur.append(part)
        if re.search(r"\(\d+ rows?\)\s*$", part):
            units.append("\n\n".join(cur).strip("\n"))
            cur = []
    if cur and "".join(cur).strip():
        units.append("\n\n".join(cur).strip("\n"))
    return units


def quidemize(unit: str) -> str:
    """Convert a quidem-style table (+--+ borders, |-wrapped rows) to
    the pg .out shape the parser reads: first border becomes the dashes
    separator, other borders drop, outer pipes strip."""
    out = []
    pipe_rows = 0
    for line in unit.split("\n"):
        t = line.strip()
        if re.fullmatch(r"\+[-+]+\+", t):
            continue  # all borders drop
        if t.startswith("|") and t.endswith("|") and len(t) > 1:
            out.append(t[1:-1])
            pipe_rows += 1
            if pipe_rows == 1:
                out.append("---")  # pg separator goes AFTER the header
        else:
            out.append(line)
            pipe_rows = 0
    return "\n".join(out)


def mysqlize(unit: str) -> str:
    """Normalize a MySQL-.result-shaped block (tab-separated cells,
    header possibly without a dashes separator) into the pg .out shape:
    tabs become pipes, and a `---` separator is inserted after the
    header when the fixture has none."""
    lines = unit.split("\n")
    qend = next((i for i, l in enumerate(lines)
                 if l.rstrip().endswith(";")), None)
    if qend is None:
        return unit
    head = lines[:qend + 1]
    rest = [l.replace("\t", "|") for l in lines[qend + 1:]]
    hi = next((i for i, l in enumerate(rest) if l.strip()), None)
    if hi is not None:
        nxt = rest[hi + 1].strip() if hi + 1 < len(rest) else ""
        if not re.fullmatch(r"[-+]{3,}", nxt):
            rest.insert(hi + 1, "---")
    return "\n".join(head + rest)


def drop_extra_dashes(unit: str) -> str:
    """quidem tables sometimes close with a second decorative all-dash
    line before the `(N rows)` fence; only the FIRST dash line (the
    header separator) is structural."""
    out = []
    seen = False
    for line in unit.split("\n"):
        if re.fullmatch(r"-{3,}", line.strip()):
            if seen:
                continue
            seen = True
        out.append(line)
    return "\n".join(out)


def port(java_name: str, suite: str, take=None, skip=None, quidem=False,
         include_ignored=False, mysql=False, base=None):
    setup, tests = extract(REF / java_name, include_ignored)
    if base is not None:
        base_setup, _ = extract(REF / base)
        setup = base_setup + setup
    if java_name.startswith("../quidem/"):
        origin = ("Apache Calcite quidem suites "
                  "(calcite core/src/test/resources/sql), as adapted by")
    elif java_name.startswith("../mysql/"):
        origin = ("MySQL server regression results "
                  "(mysql-test/r), as adapted by")
    else:
        origin = ("PostgreSQL regression suite "
                  "(postgres/src/test/regress), as adapted by")
    src = java_name.replace("../", "")
    if "/" not in src:
        src = f"postgres/{src}"
    out = [f"-- pgcorpus suite: {suite}",
           f"-- provenance: {origin}",
           f"--   sql-to-dbsp-compiler/.../{src}",
           "-- ported as test fixtures (queries + recorded expected "
           "output); see PgCorpus.scala",
           "== SETUP"]
    out.extend(setup)
    n_units = 0
    method_counter = {}
    for name, kind, mode, block in tests:
        if take and name not in take:
            continue
        if skip and name in skip:
            continue
        units = [block] if kind == "q" else split_qs_block(block)
        for unit in units:
            i = method_counter.get(name, 0)
            method_counter[name] = i + 1
            if kind != "q" and not re.search(r"\(\d+ rows?\)\s*$", unit):
                print(f"  [skip malformed] {suite}/{name}#{i}")
                continue
            out.append(f"== TEST {name}#{i} {mode}")
            # escape processing happens after unit splitting so a
            # lone "\s" row cannot read as a blank separator line
            u = unescape_java(unit).rstrip()
            if quidem:
                u = drop_extra_dashes(quidemize(u))
            if mysql:
                u = mysqlize(u)
            out.append(u)
            n_units += 1
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / f"{suite}.txt").write_text("\n".join(out) + "\n")
    print(f"{suite}: {n_units} tests, {len(setup)} setup blocks")


if __name__ == "__main__":
    port("PostgresWindowTests.java", "window")
    port("PostgresCaseTests.java", "case")
    port("PostgresLimitTests.java", "limit")
    port("PostgresBoolTests.java", "bool")
    port("PostgresGroupingSetsTests.java", "groupingsets")
    port("PostgresAggregatesTests.java", "aggregates")
    port("PostgresInt4Tests.java", "int4")
    port("PostgresInt8Tests.java", "int8")
    port("PostgresStringTests.java", "strings")
    port("PostgresDateTests.java", "date")
    port("PostgresTimestampTests.java", "timestamp")
    port("PostgresTimeTests.java", "time")
    port("PostgresNumericTests.java", "numeric")
    port("PostgresIntervalTests.java", "interval")
    port("PostgresArrayTests.java", "array")
    # the reference runtime restricts ASOF to LEFT + `>=` and keeps the
    # full-comparison expectations @Ignore'd; they are Calcite-recorded
    # answers and this engine implements the full set — port them too
    port("../quidem/AsofTests.java", "asof", quidem=True,
         include_ignored=True)
    # round-14 wave: the remaining float/int suites (value-canonical
    # float compare in PgCorpus), the Calcite quidem suites (POST /
    # scott-foodmart / HR fixtures), and the MySQL-derived suites
    port("PostgresFloat4Tests.java", "float4")
    port("PostgresFloat8Tests.java", "float8")
    port("PostgresFloat8Part2Tests.java", "float8p2")
    port("PostgresInt2Tests.java", "int2")
    port("PostgresCollateTests.java", "collate")
    port("../quidem/AggTests.java", "aggq", quidem=True,
         base="../quidem/PostBaseTests.java")
    port("../quidem/FoodmartTests.java", "foodmart", quidem=True,
         base="../quidem/FoodmartBaseTests.java")
    port("../quidem/HRWinAggTests.java", "hrwinagg", quidem=True,
         base="../quidem/HrBaseTests.java")
    port("../quidem/BigQueryTests.java", "bigquery", quidem=True)
    port("../mysql/DateFormatsTests.java", "mysql_date", mysql=True)
    port("../mysql/TimestampDiffTests.java", "mysql_tsdiff", mysql=True)
    port("../mysql/VarbinaryTests.java", "varbinary", mysql=True)
    # second quidem wave: scott-fixture window/subquery suites, the
    # POST-fixture outer-join and window batteries, sort/select/misc
    port("../quidem/WinAggTests.java", "winagg", quidem=True,
         base="../quidem/ScottBaseTests.java")
    port("../quidem/SubQueryTests.java", "subquery", quidem=True,
         base="../quidem/ScottBaseTests.java")
    port("../quidem/SelectTests.java", "selectq", quidem=True,
         base="../quidem/ScottBaseTests.java")
    port("../quidem/MiscTests.java", "miscq", quidem=True,
         base="../quidem/ScottBaseTests.java")
    port("../quidem/OuterTests.java", "outerq", quidem=True,
         base="../quidem/PostBaseTests.java")
    port("../quidem/WinAggPostTests.java", "winaggpost", quidem=True,
         base="../quidem/PostBaseTests.java")
    port("../quidem/SortTests.java", "sortq", quidem=True,
         base="../quidem/FoodmartBaseTests.java")
    # third quidem wave
    port("../quidem/AggScottTests.java", "aggscott", quidem=True,
         base="../quidem/ScottBaseTests.java")
    port("../quidem/SortHrTests.java", "sorthr", quidem=True,
         base="../quidem/HrBaseTests.java")
    port("../quidem/RedshiftTests.java", "redshiftq", quidem=True,
         base="../quidem/ScottBaseTests.java")
    port("../quidem/StructTests.java", "structq", quidem=True,
         base="../quidem/ScottBaseTests.java")
    port("../quidem/OperatorTests.java", "operatorq", quidem=True)
    # fourth wave: the five remaining quidem suites — the directory is
    # then fully ported
    port("../quidem/PivotTests.java", "pivotq", quidem=True,
         base="../quidem/ScottBaseTests.java")
    port("../quidem/SessionTests.java", "sessionq", quidem=True)
    port("../quidem/StreamTests.java", "streamq", quidem=True)
    port("../quidem/CalciteJdbcTests.java", "calcitejdbc", quidem=True,
         base="../quidem/HrBaseTests.java")
    port("../quidem/PostgresTests.java", "postgresq", quidem=True)
