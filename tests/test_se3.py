import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from deepsir_tpu.math import se3, se3_np, so3, rand


def random_se3(rng, batch=()):
    rot = Rotation.random(int(np.prod(batch)) or 1,
                          random_state=np.random.RandomState(rng.integers(2**31)))
    rots = rot.as_matrix().reshape(batch + (3, 3))
    trans = rng.normal(size=batch + (3, 1))
    return np.concatenate([rots, trans], axis=-1)


def test_inverse_concatenate_roundtrip(rng):
    g = random_se3(rng, (5,))
    composed = se3.concatenate(jnp.asarray(g), se3.inverse(jnp.asarray(g)))
    np.testing.assert_allclose(np.asarray(composed), np.broadcast_to(np.eye(3, 4), (5, 3, 4)),
                               atol=1e-6)


def test_transform_matches_numpy(rng):
    g = random_se3(rng, (4,))
    pts = rng.normal(size=(4, 100, 3))
    out_j = np.asarray(se3.transform(jnp.asarray(g), jnp.asarray(pts)))
    out_n = se3_np.transform(g, pts)
    np.testing.assert_allclose(out_j, out_n, atol=1e-6)


def test_transform_cf_agrees(rng):
    g = random_se3(rng, (2,))
    pts = rng.normal(size=(2, 50, 3))
    a = np.asarray(se3.transform(jnp.asarray(g), jnp.asarray(pts)))
    b = np.asarray(se3.transform_cf(jnp.asarray(g), jnp.asarray(pts).swapaxes(-1, -2)))
    np.testing.assert_allclose(a, b.swapaxes(-1, -2), atol=1e-6)


def test_pose_error_zero_for_identical(rng):
    g = random_se3(rng, (3,))
    err_r, err_t = se3.pose_error(jnp.asarray(g), jnp.asarray(g))
    assert np.all(np.asarray(err_r) < 1e-2)
    assert np.all(np.asarray(err_t) < 1e-6)


def test_error_gradients_finite_at_perfect_alignment():
    """The pose-loss terms must have finite gradients when pred == gt —
    arccos at the clip boundary and norm-of-zero both blow up otherwise
    (this silently NaN-skipped every training step under wt_pose_loss)."""
    import jax

    def loss(r, t):
        return jnp.sum(se3.rotation_error_rad(r, jnp.eye(3))) + \
            jnp.sum(se3.translation_error(t, jnp.zeros(3)))

    gr, gt = jax.grad(loss, argnums=(0, 1))(jnp.eye(3), jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(gr)))
    assert np.all(np.isfinite(np.asarray(gt)))


def test_pose_error_known_rotation():
    g1 = np.eye(3, 4)[None]
    rot = Rotation.from_euler("z", 30, degrees=True).as_matrix()
    g2 = np.concatenate([rot, np.array([[1.0], [2.0], [2.0]])], axis=1)[None]
    err_r, err_t = se3.pose_error(jnp.asarray(g1), jnp.asarray(g2))
    np.testing.assert_allclose(np.asarray(err_r), [30.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(err_t), [3.0], atol=1e-5)


def test_np_quat_roundtrip(rng):
    q = Rotation.random(random_state=np.random.RandomState(3)).as_quat()  # x,y,z,w
    wxyz = np.array([q[3], q[0], q[1], q[2]])
    mat = se3_np.quat2mat(wxyz)
    np.testing.assert_allclose(mat, Rotation.from_quat(q).as_matrix(), atol=1e-8)


def test_xyzquat2mat_applies_rotation():
    xyzquat = np.array([1.0, 2.0, 3.0, 1.0, 0.0, 0.0, 0.0])  # identity rot
    mat = se3_np.xyzquat2mat(xyzquat)
    np.testing.assert_allclose(mat[:3, :3], np.eye(3), atol=1e-8)
    np.testing.assert_allclose(mat[:3, 3], [1.0, 2.0, 3.0])


def test_dcm2euler_matches_scipy(rng):
    mats = Rotation.random(6, random_state=np.random.RandomState(1)).as_matrix()
    ours = so3.dcm2euler(mats, seq="xyz")
    ref = np.stack([Rotation.from_matrix(m).as_euler("xyz", degrees=True) for m in mats])
    np.testing.assert_allclose(ours, ref, atol=1e-8)


def test_uniform_sphere_norm(rng):
    v = rand.uniform_2_sphere(rng, 128)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-8)


def test_random_se3_euler_valid_rotation(rng):
    m = rand.random_se3_euler(rng, rot_mag=45.0, trans_mag=2.0, xy_rot_scale=0.1)
    r = m[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-8)
    assert abs(np.linalg.det(r) - 1) < 1e-8
    assert np.all(np.abs(m[:3, 3]) <= 2.0)


def test_apply_to_cloud_rotates_normals(rng):
    g = random_se3(rng, (1,))[0]
    cloud = rng.normal(size=(10, 7))
    out = se3_np.apply_to_cloud(g, cloud)
    np.testing.assert_allclose(out[:, :3], se3_np.transform(g, cloud[:, :3]), atol=1e-8)
    np.testing.assert_allclose(out[:, 3:6], cloud[:, 3:6] @ g[:3, :3].T, atol=1e-8)
    np.testing.assert_allclose(out[:, 6], cloud[:, 6])
