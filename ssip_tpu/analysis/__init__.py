"""Unsupervised analysis stack: standardize, PCA, K-Means, DBSCAN, t-SNE, UMAP."""
