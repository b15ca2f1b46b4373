"""The unified registration-pair dataset: dict contract, adapters, loaders.

TPU-native re-design of the reference's data layer
(exps_deep_learning/pre_dataloader.py:27-368). Same on-disk artifact set —
``{stem}_src_sample.obj`` / ``{stem}_tar_sample.obj`` point clouds,
``*_sample_normals.obj`` companions, ``*_neigh.bin`` float32 neighbor
buffers, ``*transform*.bin`` float64 (3, 4) GT transforms — and the same
emitted dict keys, but numpy end to end (no torch Dataset/DataLoader): a
plain indexable pair list plus a deterministic batching iterator whose
output is ready for ``jax.device_put`` with a batch sharding.

Conventions (all row-vector: ``tar ≈ src @ R + T`` in the centered frames):
- ``R``/``T``: GT mapping centered-src -> centered-tar.
- ``R_inv``/``T_inv``: the true inverse mapping. The reference's numpy
  ``.transpose(0, 1)`` calls are identity no-ops, which left its ``R_inv``
  equal to ``R`` (pre_dataloader.py:146-151); ours is the actual inverse —
  knowing fix, divergence documented (the reference only ever used R_inv for
  logging the ba direction).
- ``igt``: (4, 4) column-vector-convention transform mapping centered-tar ->
  centered-src, i.e. ``igt = [[R, -R @ T], [0, 1]]`` exactly as the
  reference builds it (pre_dataloader.py:127-132); ``inverse(igt)`` applied
  in column convention realizes src -> tar. Consumed by FMR's solver/eval.
- ``centers``: the mean of the *centered* target cloud (≈ 0) — faithful to
  the reference quirk (pre_dataloader.py:125: computed after centering),
  because it is what the harnesses pass as the line-sampler center.
- DCP adapter: rotations transposed to column convention
  (R_dcp = R.T, matching pre_dataloader.py:162-173) so they compare directly
  against DCP's predicted ``R_ab`` (p' = R_ab @ p + t). Points stay
  channels-LAST (our models are (B, N, 3); the reference's channels-first
  transposes are torch-layout artifacts, SURVEY.md §2.4).
- FMR adapter: truncate both clouds to the common min length
  (pre_dataloader.py:174-180).

The reference's dead re-read of the src file into V_tar_sample
(pre_dataloader.py:84-85) is dropped (quirks ledger: fix).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence

import numpy as np

from a_robust_registration_loss_tpu.data import objio


def bounding_box_corners_np(v):
    """8 AABB corners, same ordering as ops.geometry.bounding_box_corners
    (corner 0 = max, corner 7 = min; diagonal = ||c0 - c7||)."""
    mx, my, mz = v.max(0)
    nx, ny, nz = v.min(0)
    return np.array(
        [[mx, my, mz], [mx, my, nz], [mx, ny, mz], [mx, ny, nz],
         [nx, my, mz], [nx, my, nz], [nx, ny, mz], [nx, ny, nz]],
        np.float32,
    )


def _sibling(path: str, old: str, new: str) -> str:
    """Companion-file naming applied to the BASENAME only. The reference
    replaces on the whole path (pre_dataloader.py:88,95,114), which silently
    resolves to the wrong file when a directory component contains the
    pattern — e.g. its own committed layout ``sample_data/0_src_sample.obj``
    would look for normals in ``sample_normals_data/``. Knowing fix."""
    head, base = os.path.split(path)
    return os.path.join(head, base.replace(old, new, 1))


def _normals_path(sample_path: str) -> str:
    return _sibling(sample_path, "sample", "sample_normals")


def _neigh_path(sample_path: str) -> str:
    return _sibling(sample_path, ".obj", "_neigh.bin")


def _transform_path(tar_sample_path: str) -> str:
    return _sibling(_sibling(tar_sample_path, "tar_sample", "transform"),
                    ".obj", ".bin")


def load_pair_plain(src_path: str, tar_path: str,
                    estimate_normals: bool = False) -> dict:
    """One registration pair as the reference's PLAIN dict contract
    (pre_dataloader.py:78-161) — before the DCP/FMR adapters. All values
    float32 numpy.

    Graceful degradation (divergence from the reference, which crashes):
    missing ``*_sample_normals.obj`` companions yield zero normals, or
    device-side PCA estimates when ``estimate_normals`` is set (normals only
    feed RPM-Net's PPF features; the reference cannot produce normals for
    bare clouds at all), and a missing ``*transform*.bin``
    yields identity GT (R = I, T = 0 in the original frames — GT only feeds
    the monitoring metrics, never the unsupervised losses). The committed
    reference sample data ships without either companion."""
    v_src, _ = objio.read_obj(src_path)
    v_tar, _ = objio.read_obj(tar_path)

    def _read_normals(path, verts):
        if os.path.exists(path):
            nrm, _ = objio.read_obj(path)
            return nrm
        if estimate_normals:
            import jax.numpy as jnp

            from a_robust_registration_loss_tpu.ops import geometry as G

            return np.asarray(G.estimate_normals(jnp.asarray(verts)))
        return np.zeros((verts.shape[0], 3), np.float32)

    normals_src = _read_normals(_normals_path(src_path), v_src)
    normals_tar = _read_normals(_normals_path(tar_path), v_tar)
    neighs_src = np.fromfile(_neigh_path(src_path), np.float32).reshape(-1, 3)
    neighs_tar = np.fromfile(_neigh_path(tar_path), np.float32).reshape(-1, 3)

    c_src = v_src.mean(0)
    c_tar = v_tar.mean(0)
    v_src = v_src - c_src
    v_tar = v_tar - c_tar
    neighs_src = neighs_src - c_src
    neighs_tar = neighs_tar - c_tar
    tar_box = bounding_box_corners_np(v_tar)

    tpath = _transform_path(tar_path)
    if os.path.exists(tpath):
        gt = np.fromfile(tpath, np.float64).reshape(3, 4)
    else:
        gt = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)
    R = gt[:3, :3].astype(np.float64)
    # re-express the translation in the centered frames
    # (pre_dataloader.py:124): tar - c_tar = (src - c_src) @ R + T'
    T = gt[:3, 3] + (-c_tar + c_src @ R)

    igt = np.eye(4)
    igt[:3, :3] = R
    igt[:3, 3] = -R @ T

    data = {
        "points_tar_sample": v_tar.astype(np.float32),
        "points_src_sample": v_src.astype(np.float32),
        "normals_tar": normals_tar.astype(np.float32),
        "normals_src": normals_src.astype(np.float32),
        "tar_box": tar_box,
        "centers": v_tar.mean(0).astype(np.float32),
        "R": R.astype(np.float32),
        "T": T.astype(np.float32),
        "R_inv": R.T.astype(np.float32),
        "T_inv": (-R @ T).astype(np.float32),
        "points_based_neighs_src": neighs_src.astype(np.float32),
        "points_based_neighs_tar": neighs_tar.astype(np.float32),
        "igt": igt.astype(np.float32),
    }
    return data


def apply_adapters(data: dict, dcp: bool = False, fmr: bool = False) -> dict:
    """The DCP (column-convention rotations, pre_dataloader.py:162-173) and
    FMR (common-length truncation, :174-180) adapters over the plain dict."""
    data = dict(data)
    if dcp:
        data["R"] = data["R"].T.copy()
        data["R_inv"] = data["R_inv"].T.copy()
        igt_d = data["igt"].copy()
        igt_d[:3, :3] = igt_d[:3, :3].T
        data["igt"] = igt_d
    if fmr:
        n = min(data["points_src_sample"].shape[0],
                data["points_tar_sample"].shape[0])
        data["points_tar_sample"] = data["points_tar_sample"][:n]
        data["points_src_sample"] = data["points_src_sample"][:n]
    return data


def load_pair(src_path: str, tar_path: str, dcp: bool = False,
              fmr: bool = False, estimate_normals: bool = False) -> dict:
    """load_pair_plain + adapters (the full Dataset_2021_8_29 item path)."""
    return apply_adapters(load_pair_plain(src_path, tar_path,
                                          estimate_normals), dcp, fmr)


@dataclasses.dataclass(frozen=True)
class CorruptConfig:
    """Data-corruption options behind the reference RPM CLI's
    --num_points / --noise_type / --rot_mag / --trans_mag / --partial flags
    (rpm/arguments.py:41-61, upstream RPM-Net heritage) — applied host-side
    per item with epoch-varying explicit RNG, on the PLAIN contract (before
    the DCP/FMR adapters).

    - ``num_points``: random subsample of both clouds (+normals).
    - ``noise_type``: "clean" | "jitter" (clipped gaussian on the source
      cloud AND its neighbor buffer — both are surface samples of the same
      noisy scan) | "crop" (planar partial view of the source; the neighbor
      triples are cropped by their seed point under the same plane).
    - ``rot_mag`` (degrees) / ``trans_mag``: an extra random SE(3) applied
      to the source cloud, normals and neighbors, with the GT (R, T, R_inv,
      T_inv, igt) updated so the pair stays exactly consistent.
    """

    num_points: Optional[int] = None
    noise_type: str = "clean"
    jitter_scale: float = 0.01
    jitter_clip: float = 0.05
    rot_mag: float = 0.0
    trans_mag: float = 0.0
    partial_keep: float = 0.7
    seed: int = 0


def corrupt_pair(data: dict, cfg: CorruptConfig, rng) -> dict:
    """Apply CorruptConfig to one plain-contract item (see CorruptConfig).
    Output shapes depend only on (input shapes, cfg) — batch-collatable."""
    from a_robust_registration_loss_tpu.data import transforms as T

    data = dict(data)
    src = data["points_src_sample"]
    tar = data["points_tar_sample"]

    if cfg.num_points:
        for tag, cloud in (("src", src), ("tar", tar)):
            n = min(cfg.num_points, cloud.shape[0])
            idx = np.sort(rng.choice(cloud.shape[0], size=n, replace=False))
            data[f"points_{tag}_sample"] = cloud[idx]
            data[f"normals_{tag}"] = data[f"normals_{tag}"][idx]
        src = data["points_src_sample"]
        tar = data["points_tar_sample"]

    if cfg.noise_type == "jitter":
        data["points_src_sample"], _ = T.random_jitter(
            src, rng, scale=cfg.jitter_scale, clip=cfg.jitter_clip)
        neis = data["points_based_neighs_src"]
        data["points_based_neighs_src"], _ = T.random_jitter(
            neis, rng, scale=cfg.jitter_scale, clip=cfg.jitter_clip)
    elif cfg.noise_type == "crop":
        cropped, idx, direction = T.random_crop(
            src, rng, keep_ratio=cfg.partial_keep)
        data["points_src_sample"] = cropped
        data["normals_src"] = data["normals_src"][idx]
        # crop the neighbor triples by their SEED point under the same plane
        neis = data["points_based_neighs_src"].reshape(-1, 3, 3)
        seeds = neis[:, 0, :]
        k = max(1, int(round(seeds.shape[0] * cfg.partial_keep)))
        proj = seeds.astype(np.float64) @ direction.astype(np.float64)
        keep = np.sort(np.argsort(-proj, kind="stable")[:k])
        data["points_based_neighs_src"] = neis[keep].reshape(-1, 3)

    if cfg.rot_mag > 0.0 or cfg.trans_mag > 0.0:
        _, Rg = T.random_rotator(np.zeros((1, 3), np.float32), rng,
                                 mag=np.deg2rad(cfg.rot_mag))
        Tg = np.zeros(3)
        if cfg.trans_mag > 0.0:
            Tg = rng.standard_normal(3)
            Tg = Tg / np.linalg.norm(Tg) * rng.random() * cfg.trans_mag
        src = data["points_src_sample"].astype(np.float64)
        data["points_src_sample"] = (src @ Rg + Tg).astype(np.float32)
        data["normals_src"] = (
            data["normals_src"].astype(np.float64) @ Rg).astype(np.float32)
        neis = data["points_based_neighs_src"].astype(np.float64)
        data["points_based_neighs_src"] = (neis @ Rg + Tg).astype(np.float32)
        # GT update (row convention, tar = src' @ R' + T'):
        # src' = src @ Rg + Tg  =>  R' = Rg^T R, T' = T - Tg @ R'
        R = data["R"].astype(np.float64)
        Tt = data["T"].astype(np.float64)
        R2 = Rg.T @ R
        T2 = Tt - Tg @ R2
        data["R"] = R2.astype(np.float32)
        data["T"] = T2.astype(np.float32)
        data["R_inv"] = R2.T.astype(np.float32)
        data["T_inv"] = (-R2 @ T2).astype(np.float32)
        igt = np.eye(4)
        igt[:3, :3] = R2
        igt[:3, 3] = -R2 @ T2
        data["igt"] = igt.astype(np.float32)
    return data


class RegistrationPairs:
    """Indexable pair dataset over path lists (the Dataset_2021_8_29 role).

    ``cache=True`` (default) keeps parsed pairs in memory after first load:
    the on-disk data is static, so re-parsing OBJs every epoch (what the
    reference's Dataset does each __getitem__) only burns host time —
    at reference scale a full dataset is a few MB."""

    def __init__(self, src_paths: Sequence[str], tar_paths: Sequence[str],
                 dcp: bool = False, fmr: bool = False,
                 estimate_normals: bool = False, cache: bool = True,
                 corrupt: Optional[CorruptConfig] = None):
        if len(src_paths) != len(tar_paths):
            raise ValueError("src/tar path lists differ in length")
        self.src_paths = list(src_paths)
        self.tar_paths = list(tar_paths)
        self.dcp = dcp
        self.fmr = fmr
        self.estimate_normals = estimate_normals
        self.corrupt = corrupt
        self.epoch = 0
        self._cache: Optional[dict] = {} if cache else None

    def set_epoch(self, epoch: int):
        """Corruption draws are a pure function of (corrupt.seed, epoch,
        index) — fresh per epoch (the reference's per-__getitem__ transform
        randomness), reproducible across kill-and-resume."""
        self.epoch = int(epoch)

    def __len__(self):
        return len(self.src_paths)

    def _plain(self, i: int) -> dict:
        if self._cache is not None and i in self._cache:
            return self._cache[i]
        item = load_pair_plain(self.src_paths[i], self.tar_paths[i],
                               estimate_normals=self.estimate_normals)
        if self._cache is not None:
            self._cache[i] = item
        return item

    def __getitem__(self, i: int) -> dict:
        item = self._plain(i)
        if self.corrupt is not None:
            rng = np.random.default_rng((self.corrupt.seed, self.epoch, i))
            item = corrupt_pair(item, self.corrupt, rng)
        return apply_adapters(item, self.dcp, self.fmr)


def collate(items: List[dict]) -> dict:
    """Stack a list of per-pair dicts into a batch dict (leading batch axis).
    All pairs in a batch must share shapes (the reference's datasets are
    fixed-size samples; its torch default_collate has the same requirement)."""
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


class Loader:
    """Deterministic batching iterator: shuffle + drop_last like the
    reference's DataLoaders (pre_dataloader.py:220-233), but seeded
    explicitly and epoch-indexed (fork-safe, reproducible)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """Pin the shuffle epoch (the torch-DDP sampler pattern): the
        training harness calls this each epoch so batch order is a pure
        function of (seed, epoch) — reproducible across kill-and-resume and
        unaffected by extra __iter__ consumers (artifact dumps)."""
        self.epoch = int(epoch)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        n = len(self.dataset)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self.epoch)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(
                (self.seed, self.epoch)
            ).permutation(n)
        self.epoch += 1
        for s in range(0, n, self.batch_size):
            idx = order[s : s + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            yield collate([self.dataset[int(i)] for i in idx])


class PrefetchLoader:
    """Background-thread prefetch wrapper around any batch iterable: loads
    the next batch (host IO: OBJ parsing, neighbor bins) while the device
    runs the current step — the role of the reference's DataLoader worker
    processes (pre_dataloader.py:220-233, num_workers=1), double-buffered."""

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def set_epoch(self, epoch: int):
        if hasattr(self.loader, "set_epoch"):
            self.loader.set_epoch(epoch)

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()
        # worker exceptions must reach the consumer (torch DataLoader worker
        # semantics, pre_dataloader.py:220-233) — a swallowed IO/parse error
        # would silently truncate the epoch
        error: list = []

        def worker():
            try:
                for batch in self.loader:
                    q.put(batch)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item


class DeviceCache:
    """Device-resident dataset cache: the whole (tiny) dataset is stacked and
    transferred ONCE, and per-epoch batches are gathered on device.

    Round-3 verdict task 1: training epochs were idling the chip 3-5x over
    their device compute on host work — per-pair OBJ reads, per-batch
    device_put, and fetch round-trips over the tunneled link. At reference
    scale (48-60 pairs of 1024-pt clouds) the entire dataset is a few MB, so
    the host loop is pure overhead. This wrapper:

    - stacks every item of the wrapped ``Loader``'s dataset once (host) and
      ``jax.device_put``s the stacked dict once;
    - reproduces the Loader's exact shuffle stream (a pure function of
      (seed, epoch)), so batch composition — and therefore every loss — is
      bit-identical to the streaming path;
    - exposes ``device_epoch(epoch)`` for the Trainer's scanned-epoch fast
      path (ONE device dispatch per epoch, train/harness.py), and stays an
      ordinary batch iterable (device-side gathers) for code that loops
      batches (e.g. artifact dumps).

    Epoch-varying corruption (CorruptConfig) is host-side by design, so
    corrupted datasets cannot be cached — ``maybe_device_cache`` falls back
    to the streaming Loader for those. The role being replaced is the
    reference's DataLoader worker overlap (pre_dataloader.py:220-233); this
    beats it by removing the per-batch host work entirely rather than
    hiding it.
    """

    def __init__(self, loader: "Loader", sharding=None):
        import jax

        ds = loader.dataset
        if getattr(ds, "corrupt", None) is not None:
            raise ValueError("DeviceCache cannot cache epoch-varying "
                             "corruption; use the streaming Loader")
        items = [ds[i] for i in range(len(ds))]
        if not items:
            raise ValueError("empty dataset")
        stacked = collate(items)
        self.data = jax.device_put(stacked, sharding)
        self.n = len(items)
        self.batch_size = loader.batch_size
        self.shuffle = loader.shuffle
        self.drop_last = loader.drop_last
        self.seed = loader.seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = int(epoch)

    def __len__(self):
        n, b = self.n, self.batch_size
        return n // b if self.drop_last else -(-n // b)

    def _order(self, epoch: int):
        order = np.arange(self.n)
        if self.shuffle:
            order = np.random.default_rng((self.seed, epoch)).permutation(self.n)
        return order

    def device_epoch(self, epoch: int):
        """(data, full_idx (n_full, B) int32, rem_idx (r,) int32 or None):
        the device-resident epoch plan. ``full_idx`` rows are scanned as one
        device program; a non-empty remainder (drop_last=False, n % B != 0)
        is one extra differently-shaped batch handled outside the scan."""
        order = self._order(epoch)
        n_full = self.n // self.batch_size
        full = order[: n_full * self.batch_size].reshape(
            n_full, self.batch_size).astype(np.int32)
        rem = order[n_full * self.batch_size:].astype(np.int32)
        if self.drop_last or rem.size == 0:
            rem = None
        return self.data, full, rem

    def gather(self, idx):
        """One device-resident batch by row indices (jitted gather)."""
        import jax

        return jax.tree_util.tree_map(lambda a: a[jnp_asarray(idx)], self.data)

    def __iter__(self):
        _, full, rem = self.device_epoch(self.epoch)
        self.epoch += 1
        for row in full:
            yield self.gather(row)
        if rem is not None:
            yield self.gather(rem)


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def maybe_device_cache(loader, sharding=None, max_bytes=2 << 30):
    """Wrap a Loader in a DeviceCache when the dataset is cacheable (no
    epoch-varying corruption, sized, and small enough to live in HBM next to
    the working set); return the loader unchanged otherwise. Set
    ARRL_NO_DEVICE_CACHE=1 to force the streaming path."""
    if os.environ.get("ARRL_NO_DEVICE_CACHE") == "1":
        return loader
    if not isinstance(loader, Loader):
        return loader
    ds = loader.dataset
    if getattr(ds, "corrupt", None) is not None or not len(ds):
        return loader
    item_bytes = sum(np.asarray(v).nbytes for v in ds[0].values())
    if item_bytes * len(ds) > max_bytes:
        return loader
    try:
        return DeviceCache(loader, sharding)
    except (ValueError, TypeError):
        return loader


def pair_lists_views(data_path: str, n_meshes: int, n_views: int):
    """src_sample_{mesh}_{view}.obj layout (human/airplane datasets,
    pre_dataloader.py:190-209)."""
    src, tar = [], []
    for m in range(n_meshes):
        for v in range(n_views):
            src.append(os.path.join(data_path, f"src_sample_{m}_{v}.obj"))
            tar.append(os.path.join(data_path, f"tar_sample_{m}_{v}.obj"))
    return src, tar


def pair_lists_indexed(data_path: str, n: int):
    """{i}_src_sample.obj layout (real/challenge datasets,
    pre_dataloader.py:331-342 and sample_data/)."""
    src = [os.path.join(data_path, f"{i}_src_sample.obj") for i in range(n)]
    tar = [os.path.join(data_path, f"{i}_tar_sample.obj") for i in range(n)]
    return src, tar


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    data_path: str = ""
    layout: str = "indexed"        # "indexed" | "views"
    n: int = 4                     # indexed: pair count
    n_meshes: int = 110            # views layout (human defaults,
    n_views: int = 50              #   pre_dataloader.py:192-195)
    train_batch: int = 4           # pre_dataloader.py:222
    test_batch: int = 1
    train_count: Optional[int] = None   # cap on training pairs
    test_count: Optional[int] = None
    seed: int = 0
    dcp: bool = False
    fmr: bool = False
    estimate_normals: bool = False
    cache: bool = True
    corrupt: Optional[CorruptConfig] = None   # applied to train AND test
                                              # loaders (RPM-Net heritage)


def generate_datasets(cfg: DatasetConfig):
    """(train Loader, test Loader) — the generate_datasets_* role
    (pre_dataloader.py:190-368) with the path root as config instead of
    hardcoded /data1 paths, and only existing files kept."""
    if cfg.layout == "views":
        src, tar = pair_lists_views(cfg.data_path, cfg.n_meshes, cfg.n_views)
    else:
        src, tar = pair_lists_indexed(cfg.data_path, cfg.n)
    keep = [i for i, s in enumerate(src)
            if os.path.exists(s) and os.path.exists(tar[i])]
    src = [src[i] for i in keep]
    tar = [tar[i] for i in keep]
    n_train = cfg.train_count if cfg.train_count is not None else len(src)
    train_ds = RegistrationPairs(src[:n_train], tar[:n_train],
                                 dcp=cfg.dcp, fmr=cfg.fmr,
                                 estimate_normals=cfg.estimate_normals,
                                 cache=cfg.cache, corrupt=cfg.corrupt)
    test_src = src[n_train:] or src[:cfg.test_count or len(src)]
    test_tar = tar[n_train:] or tar[:cfg.test_count or len(tar)]
    test_ds = RegistrationPairs(test_src, test_tar, dcp=cfg.dcp, fmr=cfg.fmr,
                                estimate_normals=cfg.estimate_normals,
                                cache=cfg.cache, corrupt=cfg.corrupt)
    train = Loader(train_ds, cfg.train_batch, shuffle=True, drop_last=True,
                   seed=cfg.seed)
    test = Loader(test_ds, cfg.test_batch, shuffle=False, drop_last=False,
                  seed=cfg.seed)
    return train, test
