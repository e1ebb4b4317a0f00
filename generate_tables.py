#!/usr/bin/env python
"""Top-level table generator — drop-in for the reference's ``generate_tables.py``.

Thin shim over :mod:`tpuhar.report.tables`: builds every available article-style table
(Table 3 few-shot, Table 4 zero-shot, Table 5 ablations) from the standard result
artifacts in ``results/`` and saves CSV + LaTeX + Markdown, like the reference's
script (``generate_tables.py:202-335``).  With ``--demo`` it exercises the pipeline on
synthetic results, mirroring the reference's fake-data ``main()``
(``generate_tables.py:423-491``).
"""
import argparse
from pathlib import Path

from tpuhar.config import CONFIG
from tpuhar.report.tables import (
    TableGenerator,
    create_article_tables_from_results,
    format_results_for_readme,
    make_demo_results,
)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Generate article-style result tables")
    parser.add_argument(
        "--results-dir", default=None,
        help="directory with result artifacts (default: config results dir)",
    )
    parser.add_argument(
        "--demo", action="store_true",
        help="run on synthetic demo results instead of real artifacts",
    )
    args = parser.parse_args(argv)

    results_dir = Path(args.results_dir or CONFIG.paths.results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)

    if args.demo:
        gen = TableGenerator(results_dir)
        demo = make_demo_results()
        tables = {
            "table3_fewshot": gen.generate_table3_style(demo),
            "comparison_probe_vs_finetune": gen.create_comparison_table(demo),
        }
        gen.save_tables(tables, prefix="demo_")
        print(format_results_for_readme(tables))
        return

    tables = create_article_tables_from_results(results_dir)
    if not tables:
        print(f"No result artifacts found in {results_dir}")
    else:
        print(format_results_for_readme(tables))


if __name__ == "__main__":
    main()
