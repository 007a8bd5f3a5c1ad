"""Deterministic synthetic SEC quarter fixtures (FIXTURES.md schemas):
four tab-delimited files (sub/tag/num/pre.txt) with header rows,
yyyyMMdd dates, ""-quoting, empty-string nulls — the COPY INTO file
format the engine must parse. Includes the negative cases FIXTURES.md
asks for (nulls, shared company names, fy=0, malformed row in the dirty
variant)."""

from __future__ import annotations

import os
import random
from datetime import date, timedelta

TAGS = [
    ("Assets", "us-gaap/2023"),
    ("Assets", "us-gaap/2024"),
    ("Liabilities", "us-gaap/2024"),
    ("StockholdersEquity", "us-gaap/2024"),
    ("NetIncomeLoss", "us-gaap/2024"),
    ("Revenues", "us-gaap/2024"),
    ("OperatingExpenses", "us-gaap/2024"),
    ("CashAndCashEquivalents", "us-gaap/2024"),
    ("NetCashProvidedByOperatingActivities", "us-gaap/2024"),
    ("PaymentsToAcquirePropertyPlantAndEquipment", "custom/2024"),
    ("ComprehensiveIncomeNetOfTax", "us-gaap/2024"),
    ("EarningsPerShareBasic", "us-gaap/2024"),
]
STMTS = ["BS", "BS", "BS", "IS", "IS", "CF", "CF", "EQ", "CI", "UN"]
UOMS = ["USD", "USD", "USD", "shares", "USD-per-shares"]
COMPANIES = [
    ("ACME CORP", "acme"),
    ("GLOBEX INC", "globex"),
    ("INITECH LLC", "initech"),
    ("UMBRELLA PLC", "umbrella"),
    ("STARK INDUSTRIES", "stark"),
    ("WAYNE ENTERPRISES", "wayne"),
    ("ACME CORP", "acme2"),  # shared name, different cik → name-join fan-out
]


def _tsv_row(vals: list[object]) -> str:
    out = []
    for v in vals:
        if v is None:
            out.append("")
        else:
            s = str(v)
            if "\t" in s or '"' in s:
                s = '"' + s.replace('"', '""') + '"'
            out.append(s)
    return "\t".join(out)


def generate_sec_quarter(out_dir: str, seed: int = 42, dirty: bool = False) -> None:
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)

    sub_cols = (
        "adsh cik name sic countryba stprba cityba zipba bas1 bas2 baph countryma "
        "stprma cityma zipma mas1 mas2 countryinc stprinc ein former changed afs "
        "wksi fye form period fy fp filed accepted prevrpt detail instance nciks aciks"
    ).split()
    subs = []
    base = date(2024, 1, 10)
    for i in range(40):
        name, ticker = COMPANIES[i % len(COMPANIES)]
        cik = 1000 + (i % len(COMPANIES)) * 17 + (100 if i % len(COMPANIES) == 6 else 0)
        filed = base + timedelta(days=i)
        period = None if i % 13 == 0 else date(2023, 12, 31)
        fy = 0 if i % 17 == 0 else 2023
        adsh = f"{cik:010d}-24-{i:06d}"
        subs.append(
            dict(
                adsh=adsh,
                cik=cik,
                name=name,
                sic=3570 + (i % 5),
                countryba="US" if i % 4 else None,
                stprba="CA" if i % 3 else None,
                cityba="Springfield",
                zipba=f"9{i:04d}",
                bas1=f"{100 + i} MAIN ST",
                bas2=None if i % 2 else "SUITE 5",
                baph="555-0100",
                countryma="US",
                stprma="CA",
                cityma="Springfield",
                zipma=f"9{i:04d}",
                mas1=f"{100 + i} MAIN ST",
                mas2=None,
                countryinc="US",
                stprinc="DE",
                ein=10000000 + i,
                former=None,
                changed=None,
                afs="1-LAF",
                wksi=(i % 2 == 0),
                fye="1231",
                form="10-K" if i % 3 else "10-Q",
                period=period.strftime("%Y%m%d") if period else None,
                fy=fy,
                fp="FY" if i % 3 else f"Q{(i % 4) or 1}",
                filed=filed.strftime("%Y%m%d"),
                accepted=f"2024-01-{(i % 27) + 1:02d} 12:{i % 60:02d}:00",
                prevrpt=False,
                detail=True,
                instance=f"{ticker}-{filed.strftime('%Y%m%d')}.htm",
                nciks=1,
                aciks=None if i % 5 else "123456,234567",
            )
        )

    tag_cols = "tag version custom abstract datatype iord crdr tlabel doc".split()
    tags = []
    for j, (tg, ver) in enumerate(TAGS):
        tags.append(
            dict(
                tag=tg,
                version=ver,
                custom=ver.startswith("custom"),
                abstract=False,
                datatype="decimal",
                iord="I" if j % 2 else "D",
                crdr="C" if j % 3 else "D",
                tlabel=None if j % 5 == 0 else f"Label for {tg}",
                doc=None if j % 4 == 0 else f"Documentation text for {tg}.",
            )
        )

    num_cols = "adsh tag version ddate qtrs uom segments coreg value footnote".split()
    nums = []
    for k in range(2500):
        s = subs[k % len(subs)]
        tg, ver = TAGS[k % len(TAGS)]
        nums.append(
            dict(
                adsh=s["adsh"],
                tag=tg,
                version=ver,
                ddate=date(2023, 12, 31).strftime("%Y%m%d"),
                qtrs=0 if k % 2 else 4,
                uom=UOMS[k % len(UOMS)],
                segments=None if k % 7 else "Segment=Consolidated;",
                coreg=None,
                value=f"{rng.randint(0, 10**9)}.{rng.randint(0, 9999):04d}",
                footnote=None if k % 11 else "See note 5.",
            )
        )

    pre_cols = "adsh report line stmt inpth rfile tag version plabel negating".split()
    pres = []
    for k in range(600):
        s = subs[k % len(subs)]
        tg, ver = TAGS[k % len(TAGS)]
        pres.append(
            dict(
                adsh=s["adsh"],
                report=1 + k % 3,
                line=k % 40,
                stmt=STMTS[k % len(STMTS)],
                inpth=False,
                rfile="H",
                tag=tg,
                version=ver,
                plabel=None if k % 9 == 0 else f"Presented {tg}",
                negating=False,
            )
        )

    if dirty:
        # FIXTURES.md negative-case rows
        subs.append(dict(subs[0]))  # duplicate adsh
        bad = dict(subs[1])
        bad["adsh"] = "9999999999-24-999999"
        bad["name"] = None  # NULL name
        bad["fy"] = 1850  # out of range
        bad["aciks"] = "12AB,99"  # letters in aciks
        subs.append(bad)
        nums.append({**nums[0], "adsh": "0000000000-00-000000"})  # orphan FK
        nums.append({**nums[1], "value": "-5.0000"})  # below range
        nums.append({**nums[2], "tag": "NoSuchTag", "version": "none/1999"})

    def write(fname: str, cols: list[str], rows: list[dict]) -> None:
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write("\t".join(cols) + "\n")
            for r in rows:
                f.write(_tsv_row([r[c] for c in cols]) + "\n")
            if dirty and fname == "num.txt":
                f.write("only\tthree\tcolumns\n")  # short row
                # type-malformed row (unparseable date + decimal)
                f.write(
                    "0000001000-24-000000\tAssets\tus-gaap/2024\tnotadate\t0\tUSD\t\t\tnotanumber\t\n"
                )
                # NULL_IF literal in a typed column — must be salvaged
                f.write(
                    "0000001000-24-000001\tAssets\tus-gaap/2024\t20231231\tNULL\tUSD\t\t\t7.5000\tsalvaged\n"
                )

    write("sub.txt", sub_cols, subs)
    write("tag.txt", tag_cols, tags)
    write("num.txt", num_cols, nums)
    write("pre.txt", pre_cols, pres)


DUCKDB_COLUMN_TYPES = {
    "sub": {
        "adsh": "VARCHAR", "cik": "BIGINT", "name": "VARCHAR", "sic": "INTEGER",
        "countryba": "VARCHAR", "stprba": "VARCHAR", "cityba": "VARCHAR",
        "zipba": "VARCHAR", "bas1": "VARCHAR", "bas2": "VARCHAR", "baph": "VARCHAR",
        "countryma": "VARCHAR", "stprma": "VARCHAR", "cityma": "VARCHAR",
        "zipma": "VARCHAR", "mas1": "VARCHAR", "mas2": "VARCHAR",
        "countryinc": "VARCHAR", "stprinc": "VARCHAR", "ein": "BIGINT",
        "former": "VARCHAR", "changed": "VARCHAR", "afs": "VARCHAR",
        "wksi": "BOOLEAN", "fye": "VARCHAR", "form": "VARCHAR", "period": "DATE",
        "fy": "INTEGER", "fp": "VARCHAR", "filed": "DATE", "accepted": "TIMESTAMP",
        "prevrpt": "BOOLEAN", "detail": "BOOLEAN", "instance": "VARCHAR",
        "nciks": "INTEGER", "aciks": "VARCHAR",
    },
    "tag": {
        "tag": "VARCHAR", "version": "VARCHAR", "custom": "BOOLEAN",
        "abstract": "BOOLEAN", "datatype": "VARCHAR", "iord": "VARCHAR",
        "crdr": "VARCHAR", "tlabel": "VARCHAR", "doc": "VARCHAR",
    },
    "num": {
        "adsh": "VARCHAR", "tag": "VARCHAR", "version": "VARCHAR", "ddate": "DATE",
        "qtrs": "INTEGER", "uom": "VARCHAR", "segments": "VARCHAR",
        "coreg": "VARCHAR", "value": "DECIMAL(28,4)", "footnote": "VARCHAR",
    },
    "pre": {
        "adsh": "VARCHAR", "report": "INTEGER", "line": "INTEGER",
        "stmt": "VARCHAR", "inpth": "BOOLEAN", "rfile": "VARCHAR",
        "tag": "VARCHAR", "version": "VARCHAR", "plabel": "VARCHAR",
        "negating": "BOOLEAN",
    },
}


def register_sec_views(con, fixture_dir: str) -> None:
    """DuckDB views over the fixture TSVs with COPY-INTO-equivalent
    parse options."""
    for name, cols in DUCKDB_COLUMN_TYPES.items():
        colspec = ", ".join(f"'{c}': '{t}'" for c, t in cols.items())
        con.execute(
            f"""
            CREATE OR REPLACE VIEW raw_{name} AS
            SELECT * FROM read_csv('{fixture_dir}/{name}.txt',
                delim='\t', header=true, quote='"', escape='"',
                dateformat='%Y%m%d',
                timestampformat='%Y-%m-%d %H:%M:%S',
                nullstr=['', 'NULL', 'null'],
                columns={{{colspec}}})
            """
        )
