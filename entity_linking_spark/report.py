"""Retrieval-rate report rendering — the reference's plot artifact.

The reference renders retrieval-rate-vs-k curves with matplotlib
(src/generate_plots.py:1-20) from eval output; this engine computes the
same metric distributedly (operators/topk.py:retrieval_rates) and
renders it as a deterministic markdown table + ASCII bar chart (no
plotting dependency in the sandbox; the numbers are the artifact).
Exposed as ``cli.py report``.
"""

from __future__ import annotations

BAR_WIDTH = 40


def render_retrieval_report(
    rates: dict[int, float], title: str = "Retrieval rate @ k"
) -> str:
    """Deterministic markdown for {k: rate} (rate in [0, 1])."""
    lines = [f"# {title}", ""]
    lines.append("| k | retrieval rate | |")
    lines.append("|---:|---:|:---|")
    for k in sorted(rates):
        rate = rates[k]
        bar = "#" * int(round(rate * BAR_WIDTH))
        lines.append(f"| {k} | {rate:.4f} | `{bar:<{BAR_WIDTH}}` |")
    lines.append("")
    return "\n".join(lines)


def rates_from_row(row) -> dict[int, float]:
    """{k: rate} from the one-row retrieval_rates() result
    (columns retrieval_rate_k{k})."""
    out: dict[int, float] = {}
    for name in row.__fields__:
        if name.startswith("retrieval_rate_k"):
            out[int(name[len("retrieval_rate_k"):])] = float(row[name])
    return out
