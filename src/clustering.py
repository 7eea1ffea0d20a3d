"""CLI: clustering analysis over standardized features (TPU-native).

Flag parity: reference docs/cli_reference.md §src.clustering. Orchestration
semantics: reference src/clustering.py:780-927.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from ssip_tpu.analysis import clustering as C
from ssip_tpu.analysis.dbscan import auto_eps_from_kdistance
from ssip_tpu.report.cluster_plots import plot_embedding, plot_k_distance
from ssip_tpu.runtime.logging import configure_logging


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--features-npz", type=Path, required=True)
    parser.add_argument("--output-root", type=Path, default=Path("outputs"))
    parser.add_argument("--variance-target", type=float, default=0.9)
    parser.add_argument("--tsne-dim", type=int, default=50)
    parser.add_argument(
        "--tsne-perplexities", type=float, nargs="*", default=[10.0, 30.0, 50.0]
    )
    parser.add_argument("--umap-neighbors", type=int, nargs="*", default=[15, 30, 50])
    parser.add_argument("--umap-min-dist", type=float, nargs="*", default=[0.0, 0.1])
    parser.add_argument(
        "--kmeans-range", type=int, nargs="*", default=list(range(2, 11))
    )
    parser.add_argument("--kmeans-n-init", type=int, default=10)
    parser.add_argument(
        "--dbscan-eps", type=float, nargs="*", default=[0.5, 0.75, 1.0, 1.25]
    )
    parser.add_argument("--dbscan-min-samples", type=int, nargs="*", default=[5, 10, 15])
    parser.add_argument(
        "--dbscan-scope", choices=["all", "labeled", "unlabeled"], default="all"
    )
    parser.add_argument("--dbscan-auto", action="store_true")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument(
        "--log-level", choices=["DEBUG", "INFO", "WARNING", "ERROR"], default="INFO"
    )
    parser.add_argument(
        "--device", choices=["cpu", "auto"], default="cpu",
        help="cpu (default): run the analysis kernels on the host CPU "
        "backend — this stage is small-N linear algebra (the reference "
        "runs it on CPU, clustering.py:780-927) and XLA-TPU SVD is "
        "unreliable over remote runtimes; auto: keep the process default "
        "backend (accelerator when present)",
    )
    return parser.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    configure_logging(args.log_level)
    if args.device == "cpu":
        # Must precede first backend touch; the persistent compile cache
        # then stays disabled for these CPU compiles (setup_jax invariant).
        import jax

        jax.config.update("jax_platforms", "cpu")
    from ssip_tpu.runtime.jaxconfig import setup_jax

    setup_jax()

    bundle = C.load_feature_bundle(args.features_npz)
    stats = C.validate_standardization(bundle)

    pca_results = C.run_pca(
        bundle.features, args.variance_target, args.tsne_dim, args.seed
    )
    embedding_dir = args.output_root / "features" / "embeddings"
    C.save_embedding_npz(embedding_dir, pca_results.cluster_space)
    C.save_embedding_npz(embedding_dir, pca_results.pca_2d)
    C.save_embedding_npz(embedding_dir, pca_results.pca_tsne_init)

    tsne_results = C.run_tsne(
        pca_results.pca_tsne_init, args.tsne_perplexities, args.seed
    )
    for result in tsne_results:
        C.save_embedding_npz(embedding_dir, result)
    umap_results = C.run_umap(
        pca_results.pca_tsne_init, args.umap_neighbors, args.umap_min_dist, args.seed
    )
    for result in umap_results:
        C.save_embedding_npz(embedding_dir, result)

    kmeans_results = C.evaluate_kmeans(
        pca_results.cluster_space, bundle, args.kmeans_range, args.kmeans_n_init,
        args.seed,
    )

    dbscan_eps_grid = args.dbscan_eps
    figures_dir = args.output_root / "figures"
    if args.dbscan_auto:
        if args.dbscan_scope == "labeled":
            mask = bundle.labeled_mask
        elif args.dbscan_scope == "unlabeled":
            mask = bundle.unlabeled_mask
        else:
            mask = np.ones(pca_results.cluster_space.data.shape[0], dtype=bool)
        sub_space = pca_results.cluster_space.data[mask]
        for ms in args.dbscan_min_samples:
            plot_k_distance(
                C.EmbeddingResult(
                    f"pca_cluster:{args.dbscan_scope}", sub_space, {}
                ),
                int(ms),
                figures_dir / f"kdist_plot_{args.dbscan_scope}_ms{int(ms)}.png",
            )
        dbscan_eps_grid = []
        for ms in args.dbscan_min_samples:
            base_eps = auto_eps_from_kdistance(sub_space, int(ms), quantile=0.98)
            dbscan_eps_grid.extend(max(1e-6, base_eps * f) for f in (0.8, 1.0, 1.2))
        dbscan_eps_grid = sorted(set(float(e) for e in dbscan_eps_grid))

    dbscan_results = C.evaluate_dbscan(
        pca_results.cluster_space, bundle, dbscan_eps_grid, args.dbscan_min_samples,
        args.seed, scope=args.dbscan_scope,
    )

    all_results = kmeans_results + dbscan_results
    C.write_metrics_table(
        all_results, args.output_root / "tables" / "metrics_clustering.csv"
    )

    best_kmeans = C.choose_best(kmeans_results)
    if best_kmeans is None:
        raise RuntimeError("K-Means sweep produced no viable solutions.")
    best_dbscan = C.choose_best(dbscan_results)

    tsne_choice = tsne_results[0] if tsne_results else pca_results.pca_2d
    umap_choice = umap_results[0] if umap_results else pca_results.pca_2d
    C.write_assignments_table(
        bundle, best_kmeans, best_dbscan, pca_results, tsne_choice, umap_choice,
        args.output_root / "tables" / "cluster_assignments.csv",
    )

    noise_rate = best_dbscan.noise_rate if best_dbscan is not None else None
    plot_embedding(
        pca_results.pca_2d, bundle, best_kmeans.labels,
        "PCA 2D — labeled overlay", figures_dir / "pca2d_clusters.png",
        dbscan_noise_rate=noise_rate,
    )
    if tsne_results:
        plot_embedding(
            tsne_choice, bundle, best_kmeans.labels,
            "t-SNE 2D — labeled overlay", figures_dir / "tsne2d_clusters.png",
            dbscan_noise_rate=noise_rate,
        )
    if umap_results:
        plot_embedding(
            umap_choice, bundle, best_kmeans.labels,
            "UMAP 2D — labeled overlay", figures_dir / "umap2d_clusters.png",
            dbscan_noise_rate=noise_rate,
        )
    if best_dbscan is not None:
        # k-distance figure for the BEST DBSCAN's scope, over that scope's
        # masked points and its min_samples — reference
        # src/clustering.py:898-917 (round-2 verdict: a hardcoded
        # ("all", ones) loop mis-named the file and plotted the wrong point
        # set whenever the best config was labeled/unlabeled-scoped).
        scope = str(best_dbscan.params.get("scope", args.dbscan_scope))
        if scope == "labeled":
            mask = bundle.labeled_mask
        elif scope == "unlabeled":
            mask = bundle.unlabeled_mask
        else:
            mask = np.ones(pca_results.cluster_space.data.shape[0], dtype=bool)
        plot_k_distance(
            C.EmbeddingResult(
                f"pca_cluster:{scope}", pca_results.cluster_space.data[mask], {}
            ),
            int(best_dbscan.params.get("min_samples", 5)),
            figures_dir / f"kdist_plot_{scope}.png",
        )

    C.write_report(
        args.output_root / "notes" / "clustering_report.md",
        stats, best_kmeans, best_dbscan,
    )
    logging.info("Clustering analysis complete.")


if __name__ == "__main__":
    main()
