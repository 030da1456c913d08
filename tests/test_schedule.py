"""Exhaustive tests of the progressive schedule state machine — the
reference's historical bug nest (README.md:92-107)."""

import pytest

from pggan_tpu.train.schedule import ProgressiveSchedule


def make(max_steps=(10, 20, 40), starts=(-1, 2, 4), intervals=(0, 1, 2),
         ntimes=(0, 4, 5)):
    return ProgressiveSchedule(
        max_step_at_scale=list(max_steps),
        alpha_jump_start=list(starts),
        alpha_jump_interval=list(intervals),
        alpha_jump_Ntimes=list(ntimes))


class TestInit:
    def test_initial_state(self):
        s = make()
        assert s.scale_index == 0
        assert s.alpha == 0.0
        assert s.next_scale_jump_step == 10       # max_step_at_scale[0]
        assert s.next_alpha_jump_step == -1       # alpha_jump_start[0]

    def test_start_minus_one_never_fires(self):
        s = make()
        for step in range(10):
            jumps = s.check_jump(step)
            assert not jumps["alpha_jumped"]


class TestScaleJump:
    def test_jump_at_exact_step(self):
        s = make()
        assert not s.check_jump(9)["scale_jumped"]
        assert s.check_jump(10)["scale_jumped"]
        assert s.scale_index == 1
        assert s.next_scale_jump_step == 30       # 10 + 20

    def test_alpha_reset_on_scale_jump(self):
        s = make()
        s.check_jump(10)
        assert s.alpha == 0.0
        assert s.alpha_index == 0
        assert s.next_alpha_jump_step == 12       # 10 + start[1]=2
        assert s.alpha_jump_value == 0.25         # 1/Ntimes[1]=1/4

    def test_resolution_tracks_scale(self):
        s = make()
        assert s.resolution == 4
        s.check_jump(10)
        assert s.resolution == 8


class TestAlphaFade:
    def test_full_fade_sequence(self):
        s = make()
        s.check_jump(10)                          # scale jump
        alphas = []
        for step in range(11, 30):
            s.check_jump(step)
            alphas.append(s.alpha)
        # jumps at 12,13,14,15 (interval=1, 4 times) then disabled
        assert s.alpha == 1.0
        assert s.alpha_index == 4
        assert s.next_alpha_jump_step == 0        # disable sentinel
        assert alphas[0] == 0.0                   # step 11: not yet
        assert alphas[1] == 0.25                  # step 12
        assert alphas[4] == 1.0                   # step 15

    def test_alpha_rounded_4dp(self):
        s = make(ntimes=(0, 3, 3))
        s.check_jump(10)
        s.check_jump(12)
        assert s.alpha == round(1 / 3, 4) == 0.3333

    def test_simultaneous_scale_and_alpha_checks(self):
        # reference checks scale first, then alpha, same step
        # (pggan/model.py:196-204)
        s = make(starts=(-1, 0, 0))
        jumps = s.check_jump(10)
        assert jumps["scale_jumped"] and jumps["alpha_jumped"]
        assert s.alpha == 0.25


class TestReferenceDefaultConfig:
    def test_default_schedule_walkthrough(self):
        # reference configs.yaml values, scales 0→2
        s = ProgressiveSchedule(
            max_step_at_scale=[10000, 20000, 40000],
            alpha_jump_start=[-1, 2000, 4000],
            alpha_jump_interval=[0, 100, 100],
            alpha_jump_Ntimes=[0, 100, 200])
        fired = []
        # train.py caps max_step at sum(max_step_at_scale)=70000, so the
        # loop runs steps 0..69999 and the final jump never fires.
        for step in range(0, 70000, 1):
            j = s.check_jump(step)
            if j["scale_jumped"]:
                fired.append((step, "scale", s.scale_index))
        assert (10000, "scale", 1) in fired
        assert (30000, "scale", 2) in fired
        assert s.alpha == 1.0                     # fully faded at scale 2

    def test_alpha_count_scale1(self):
        s = ProgressiveSchedule(
            max_step_at_scale=[10000, 20000],
            alpha_jump_start=[-1, 2000],
            alpha_jump_interval=[0, 100],
            alpha_jump_Ntimes=[0, 100])
        n_alpha = 0
        for step in range(0, 30000):
            if s.check_jump(step)["alpha_jumped"]:
                n_alpha += 1
        assert n_alpha == 100
        assert s.alpha == 1.0


class TestCheckpointRoundTrip:
    def test_state_dict_roundtrip(self):
        s = make()
        for step in range(15):
            s.check_jump(step)
        snap = s.state_dict()
        s2 = make()
        s2.load_state_dict(snap)
        for step in range(15, 40):
            assert s.check_jump(step) == s2.check_jump(step)
        assert s.state_dict() == s2.state_dict()
