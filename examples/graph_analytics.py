#!/usr/bin/env python
"""Graph-analytics tour over the part co-order graph.

Builds the co-occurrence graph (parts adjacent iff they appear in the
same order) from lineitem and runs the round-4 graph family: degree
histogram, assortativity, clustering coefficient, triangle count,
k-core, and the three link-prediction scores.

Usage:  python examples/graph_analytics.py [sf_dir]   (default sf0.001)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    from reden_ray.pipelines import relational as R

    print("degree histogram (top 5 by node count):")
    print(
        R.graph_degree_hist(sf)
        .to_pandas()
        .sort_values("n_nodes", ascending=False)
        .head()
        .to_string(index=False)
    )
    print("\nassortativity:", R.graph_assortativity(sf).to_pandas().iloc[0, 0])
    print("triangles:", R.graph_triangles(sf).to_pandas().iloc[0, 0])

    cc = R.graph_clustering_coeff(sf).to_pandas()
    print(f"clustering coefficient: mean {cc.cc.mean():.4f} over {len(cc)} nodes")

    kc = R.graph_kcore(sf).to_pandas()
    print("k-core: max core =", kc.core.max(), "| nodes at max:",
          int((kc.core == kc.core.max()).sum()))

    print("\ntop-5 predicted links (Adamic-Adar):")
    print(R.graph_adamic_adar(sf, k=5).to_pandas().to_string(index=False))

    ray.shutdown()


if __name__ == "__main__":
    main()
