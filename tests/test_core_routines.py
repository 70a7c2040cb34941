"""Golden state-snapshot tests for the core BDF routines.

The preconditions/postconditions are solver-state snapshots captured from an
instrumented C SUNDIALS run, taken verbatim from the reference test suite
(reference src/tests/{set_coeffs,predict,restore,test_error,complete_step,
get_solution}.rs). They are engine-independent oracles (SURVEY.md §4):
asserting against them routine-by-routine is how the reference achieved
numerical parity with C IDA.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ida_tpu.core.state import init_state, IdaOptions
from ida_tpu.core.coeffs import set_coeffs, predict, restore
from ida_tpu.core.error_test import error_test
from ida_tpu.core.complete_step import complete_step
from ida_tpu.core.interp import get_solution
from ida_tpu.models import roberts_problem

RTOL = 1e-12  # golden snapshots reproduce to rounding; FMA differences ~1e-14


def dummy_state(n=3):
    prob = roberts_problem(with_roots=False)
    return init_state(prob, np.zeros(n), np.zeros(n)), prob


def a(x):
    return jnp.asarray(np.array(x), jnp.float64)


class TestSetCoeffs:
    def test1(self):
        # reference src/tests/set_coeffs.rs:4-162
        state, _ = dummy_state()
        state = state._replace(
            phi=a([
                [4.1295003522440181e-07, 1.6518008147114031e-12, 9.9999958704831304e-01],
                [-6.4049734044789205e-08, -2.5619916159829551e-13, 6.4049990326726996e-08],
                [2.1135440604995772e-08, 8.4541889872000439e-14, -2.1135525197726480e-08],
                [-2.2351400807868742e-08, -8.9405756031743853e-14, 2.2351489636470618e-08],
                [1.8323105973439385e-08, 7.3292641194159994e-14, -1.8323176512520801e-08],
                [-2.2423672161947766e-10, -8.9709159667337618e-16, 2.2422474012398869e-10],
            ]),
            psi=a([6.6874844417638421e+08, 1.4118022710390334e+09, 1.8407375671333179e+09,
                   1.8153920670983608e+09, 2.1446764804714236e+09, 2.6020582487631597e+07]),
            alpha=a([1.0, 4.7368421052631576e-01, 3.6330461012857090e-01,
                     4.0930763129879277e-01, 3.9999999999999997e-01, 3.6363636363636365e-01]),
            beta=a([1.0, 9.0000000000000002e-01, 1.0841585634594841e+00,
                    3.5332089881864119e+00, 7.1999999999999993e+00, 1.0285714285714285e+01]),
            sigma=a([1.0, 4.7368421052631576e-01, 3.4418331485864612e-01,
                     7.2268199139687761e-01, 1.4222222222222223e+00, 2.5858585858585861e+00]),
            gamma=a([0.0, 1.4953305816383288e-09, 2.2036450676775371e-09,
                     2.8236868704168917e-09, 3.0437121109953610e-09, 3.1823098347208659e-07]),
            kk=jnp.int32(2), kused=jnp.int32(2), ns=jnp.int32(1),
            hh=a(6.6874844417638421e+08), hused=a(6.6874844417638421e+08),
            cj=a(2.2429958724574930e-09), cjlast=a(2.4672954597032423e-09),
        )

        state, ck = set_coeffs(state)

        np.testing.assert_allclose(float(ck), 0.3214285714285713969, rtol=RTOL)
        np.testing.assert_allclose(
            np.asarray(state.phi),
            [
                [4.1295003522440181e-07, 1.6518008147114031e-12, 9.9999958704831304e-01],
                [-6.4049734044789205e-08, -2.5619916159829551e-13, 6.4049990326726996e-08],
                [2.0023048994206519e-08, 8.0092316720842518e-14, -2.0023129134688242e-08],
                [-2.2351400807868742e-08, -8.9405756031743853e-14, 2.2351489636470618e-08],
                [1.8323105973439385e-08, 7.3292641194159994e-14, -1.8323176512520801e-08],
                [-2.2423672161947766e-10, -8.9709159667337618e-16, 2.2422474012398869e-10],
            ],
            rtol=RTOL,
        )
        np.testing.assert_allclose(
            np.asarray(state.psi),
            [6.6874844417638421e+08, 1.3374968883527684e+09, 2.0805507152154176e+09,
             1.8153920670983608e+09, 2.1446764804714236e+09, 2.6020582487631597e+07],
            rtol=RTOL,
        )
        np.testing.assert_allclose(
            np.asarray(state.alpha),
            [1.0, 0.5, 3.2142857142857140e-01, 4.0930763129879277e-01,
             3.9999999999999997e-01, 3.6363636363636365e-01],
            rtol=RTOL,
        )
        np.testing.assert_allclose(
            np.asarray(state.beta),
            [1.0, 1.0, 9.4736842105263153e-01, 3.5332089881864119e+00,
             7.1999999999999993e+00, 1.0285714285714285e+01],
            rtol=RTOL,
        )
        np.testing.assert_allclose(
            np.asarray(state.sigma),
            [1.0, 0.5, 3.2142857142857140e-01, 7.2268199139687761e-01,
             1.4222222222222223e+00, 2.5858585858585861e+00],
            rtol=RTOL,
        )
        np.testing.assert_allclose(
            np.asarray(state.gamma),
            [0.0, 1.4953305816383288e-09, 2.2429958724574930e-09,
             2.8236868704168917e-09, 3.0437121109953610e-09, 3.1823098347208659e-07],
            rtol=RTOL, atol=1e-30,
        )
        assert int(state.ns) == 2
        np.testing.assert_allclose(float(state.cj), 2.2429958724574930e-09, rtol=RTOL)
        np.testing.assert_allclose(float(state.cjlast), 2.2429958724574930e-09, rtol=RTOL)


def test_set_coeffs_case2():
    # reference src/tests/set_coeffs.rs:164-342: ns has reached kused+1 so
    # the (kk+1 >= ns) branch still runs but with ns saturating; all
    # coefficient arrays must come out unchanged, ns -> 3, ck = 1/3
    state, _ = dummy_state()
    phi = [
        [9.9992400889930733e-01, 3.5884428024527148e-05, 4.0106672668125017e-05],
        [-1.3748619452022122e-05, 1.1636437126348729e-06, 1.2584975739367733e-05],
        [1.7125607629565644e-09, -1.3178687286728842e-06, 1.3161561679729596e-06],
        [2.1033954646845001e-10, 1.0217905523752639e-06, -1.0220008918107099e-06],
        [-1.3875550771817554e-10, 1.3559268269012917e-06, -1.3557880688400603e-06],
        [-1.1465196356066767e-10, 2.0021935974335382e-07, -2.0010470777979317e-07],
    ]
    psi = [3.4384304814216195e-04, 6.8768609628432390e-04, 1.0315291444264857e-03,
           7.7938390297730776e-04, 3.4639284576769232e-04, 0.0]
    alpha = [1.0, 0.5, 3.3333333333333337e-01, 4.4444444444444442e-01, 0.5, 0.0]
    beta = [1.0, 1.0, 1.0, 4.8000000000000007e+00, 15.0, 0.0]
    sigma = [1.0, 0.5, 3.3333333333333337e-01, 8.8888888888888884e-01,
             2.4380952380952383e+00, 0.0]
    gamma = [0.0, 2.9083036734439079e+03, 4.3624555101658616e+03,
             6.2549405772650898e+03, 1.6001650180080363e+04, 0.0]
    state = state._replace(
        phi=a(phi), psi=a(psi), alpha=a(alpha), beta=a(beta), sigma=a(sigma),
        gamma=a(gamma), kk=jnp.int32(2), kused=jnp.int32(2), ns=jnp.int32(2),
        hh=a(3.4384304814216195e-04), hused=a(3.4384304814216195e-04),
        cj=a(4.3624555101658616e+03), cjlast=a(4.3624555101658616e+03),
    )
    state, ck = set_coeffs(state)
    np.testing.assert_allclose(float(ck), 0.3333333333333334814, rtol=RTOL)
    assert int(state.ns) == 3
    np.testing.assert_allclose(np.asarray(state.phi), phi, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(state.psi), psi, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(state.alpha), alpha, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(state.beta), beta, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(state.sigma), sigma, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(state.gamma), gamma, rtol=RTOL)
    np.testing.assert_allclose(float(state.cj), 4.3624555101658616e+03, rtol=RTOL)
    np.testing.assert_allclose(float(state.cjlast), 4.3624555101658616e+03, rtol=RTOL)


def test_predict():
    # reference src/tests/predict.rs:4-77
    state, _ = dummy_state()
    phi = a([
        [1.0570152037228958e-07, 4.2280612558303261e-13, 9.9999989429805680e-01],
        [-3.3082196412696304e-08, -1.3232881828710420e-13, 3.3082328676061534e-08],
        [1.8675273859330434e-08, 7.4701128706323864e-14, -1.8675348801050254e-08],
        [-1.9956501813542136e-08, -7.9826057803058290e-14, 1.9956580862443821e-08],
        [1.2851942479612096e-09, 5.1407743965993651e-15, -1.2851948368212051e-09],
        [-2.2423672161947766e-10, -8.9709159667337618e-16, 2.2422474012398869e-10],
    ])
    state = state._replace(
        phi=phi,
        gamma=a([0.0, 2.6496925453439462e-10, 3.8862188959925182e-10,
                 8.0997073172076138e-10, 3.0437121109953610e-09, 3.1823098347208659e-07]),
        kk=jnp.int32(2),
    )
    state = predict(state)
    np.testing.assert_allclose(
        np.asarray(state.yypredict),
        [9.1294597818923714e-08, 3.6517843600225230e-13, 9.9999990870503663e-01],
        rtol=RTOL,
    )
    np.testing.assert_allclose(
        np.asarray(state.yppredict),
        [-1.5081447058360581e-18, -6.0325745419028739e-24, 1.5081506275685795e-18],
        rtol=1e-10,
    )
    np.testing.assert_allclose(np.asarray(state.phi), np.asarray(phi), rtol=RTOL)


def test_restore():
    # reference src/tests/restore.rs:4-101
    state, _ = dummy_state()
    state = state._replace(
        tn=a(1.9051606517223076e-03),
        ns=jnp.int32(1),
        kk=jnp.int32(2),
        hh=a(6.9278569153538464e-04),
        phi=a([
            [9.9995150785077214e-01, 3.2239271870584518e-05, 1.6252877357362511e-05],
            [-2.7707635503825098e-05, 9.7313256739903617e-06, 1.7976309829765466e-05],
            [3.4935651154088256e-09, -1.0880124117276491e-05, 1.0876630551341415e-05],
            [5.6694097544747856e-10, 2.1378758881496850e-08, -2.1945701078189652e-08],
            [-1.3875550771817554e-10, 1.3559268269012917e-06, -1.3557880688400603e-06],
            [-1.1465196356066767e-10, 2.0021935974335382e-07, -2.0010470777979317e-07],
        ]),
        psi=a([6.9278569153538464e-04, 1.0391785373030770e-03, 1.3855713830707693e-03,
               7.7938390297730776e-04, 3.4639284576769232e-04, 0.0]),
        beta=a([1.0, 2.0, 3.0, 4.8000000000000007e+00, 15.0, 0.0]),
    )
    saved_t = a(1.2123749601869230e-03)
    state = restore(state, saved_t)

    np.testing.assert_allclose(float(state.tn), float(saved_t), rtol=RTOL)
    assert int(state.ns) == 1 and int(state.kk) == 2
    np.testing.assert_allclose(
        np.asarray(state.phi),
        [
            [9.9995150785077214e-01, 3.2239271870584518e-05, 1.6252877357362511e-05],
            [-1.3853817751912549e-05, 4.8656628369951808e-06, 8.9881549148827332e-06],
            [1.1645217051362752e-09, -3.6267080390921635e-06, 3.6255435171138049e-06],
            [5.6694097544747856e-10, 2.1378758881496850e-08, -2.1945701078189652e-08],
            [-1.3875550771817554e-10, 1.3559268269012917e-06, -1.3557880688400603e-06],
            [-1.1465196356066767e-10, 2.0021935974335382e-07, -2.0010470777979317e-07],
        ],
        rtol=RTOL,
    )
    np.testing.assert_allclose(
        np.asarray(state.psi),
        [3.4639284576769237e-04, 6.9278569153538464e-04, 1.3855713830707693e-03,
         7.7938390297730776e-04, 3.4639284576769232e-04, 0.0],
        rtol=RTOL,
    )


class TestErrorTest:
    def _mk(self, kk, phi, ee, ewt, sigma):
        state, prob = dummy_state()
        state = state._replace(
            kk=jnp.int32(kk), phi=a(phi), ee=a(ee), ewt=a(ewt), sigma=a(sigma)
        )
        return state, prob

    def test1_fails(self):
        # reference src/tests/test_error.rs:3-57 (expected: error test FAILS)
        state, prob = self._mk(
            kk=5,
            phi=[
                [3.634565317158998e-05, 1.453878335134203e-10, 0.9999636542014404],
                [-6.530333550677049e-06, -2.612329458968465e-11, 6.530359673556191e-06],
                [1.946442728026142e-06, 7.786687275994346e-12, -1.946450515496441e-06],
                [-8.097632208221231e-07, -3.239585549038764e-12, 8.097664556005615e-07],
                [3.718130977075839e-07, 1.487573462300438e-12, -3.71814615793545e-07],
                [-3.24421895454213e-07, -1.297915245220823e-12, 3.244230624265827e-07],
            ],
            ee=[2.65787533317467e-07, 1.063275845801634e-12, -2.657884288386138e-07],
            ewt=[73343005.56993243, 999999.985461217, 9901.346408259429],
            sigma=[1.0, 0.6666666666666666, 0.6666666666666666, 0.888888888888889,
                   1.422222222222222, 2.585858585858586],
        )
        state, r = error_test(state, prob, IdaOptions(), a(1.091414141414142))
        assert int(state.knew) == 4
        assert not bool(r.converged)
        np.testing.assert_allclose(float(r.err_k), 29.10297975314245, rtol=RTOL)
        np.testing.assert_allclose(float(r.err_km1), 3.531162835377502, rtol=RTOL)

    def test2_passes(self):
        # reference src/tests/test_error.rs:59-117
        state, prob = self._mk(
            kk=4,
            phi=[
                [3.051237735052657e-05, 1.220531905117091e-10, 0.9999694875005963],
                [-2.513114849098281e-06, -1.005308974226734e-11, 2.513124902721765e-06],
                [4.500284453718991e-07, 1.800291970640913e-12, -4.500302448499092e-07],
                [-1.366709389821433e-07, -5.467603693902342e-13, 1.366714866794709e-07],
                [7.278821769100639e-08, 2.911981566628798e-13, -7.278850816613011e-08],
                [-8.304741244343501e-09, -3.324587131187576e-14, 8.304772990651073e-09],
            ],
            ee=[-2.981302228744271e-08, -1.192712676406388e-13, 2.981313872620108e-08],
            ewt=[76621085.31777237, 999999.9877946811, 9901.289220872719],
            sigma=[1.0, 0.5, 0.3214285714285715, 0.2396514200444849,
                   0.1941955227762807, 2.585858585858586],
        )
        state, r = error_test(state, prob, IdaOptions(), a(0.2025812352167927))
        assert int(state.knew) == 4
        assert bool(r.converged)
        np.testing.assert_allclose(float(r.err_k), 0.2561137489433976, rtol=RTOL)
        np.testing.assert_allclose(float(r.err_km1), 0.455601916633899, rtol=RTOL)


class TestCompleteStep:
    def test1(self):
        # reference src/tests/complete_step.rs:3-107 (phase 0, first step)
        state, prob = dummy_state()
        state = state._replace(
            nst=jnp.int64(0), kk=jnp.int32(1), kused=jnp.int32(0), knew=jnp.int32(1),
            phase=jnp.int32(0), hh=a(2.1649552860480770e-05), hused=a(0.0), rr=a(0.0),
            phi=a([
                [1.0, 0.0, 0.0],
                [-8.6598211441923077e-07, 8.6598211441923077e-07, 0.0],
                [0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0],
            ]),
            ee=a([7.5001558608301906e-13, -4.8726813621044346e-10, 4.8651812062436036e-10]),
            ewt=a([9.9990000999900003e+03, 1.0e6, 1.0e6]),
        )
        state = complete_step(state, prob, IdaOptions(), a(0.0001987733462845937), a(0.0))
        assert int(state.nst) == 1
        assert int(state.kk) == 1 and int(state.kused) == 1
        np.testing.assert_allclose(float(state.hh), 2.1649552860480770e-05, rtol=RTOL)
        np.testing.assert_allclose(float(state.hused), 2.1649552860480770e-05, rtol=RTOL)
        assert int(state.phase) == 0
        np.testing.assert_allclose(
            np.asarray(state.phi),
            [
                [9.9999913401863560e-01, 8.6549484628302034e-07, 4.8651812062436036e-10],
                [-8.6598136440364466e-07, 8.6549484628302034e-07, 4.8651812062436036e-10],
                [7.5001558608301906e-13, -4.8726813621044346e-10, 4.8651812062436036e-10],
                [0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0],
            ],
            rtol=RTOL,
        )

    def test2(self):
        # reference src/tests/complete_step.rs:109-201 (phase 0, order raise)
        state, prob = dummy_state()
        state = state._replace(
            nst=jnp.int64(2), kk=jnp.int32(2), kused=jnp.int32(1), knew=jnp.int32(2),
            phase=jnp.int32(0), hh=a(4.3299105720961540e-05),
            hused=a(2.1649552860480770e-05), rr=a(0.0),
            phi=a([
                [9.9999826803802172e-01, 1.7295310279504897e-06, 2.4309503863111873e-09],
                [-1.7319612278663124e-06, 1.7280723633349389e-06, 3.8888645313736536e-09],
                [2.2514114651871690e-12, -4.3759938466525865e-09, 4.3737424351873994e-09],
                [0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0],
            ]),
            ee=a([-4.2122294839452673e-13, -2.4605442771223734e-09, 2.4609655000707684e-09]),
            ewt=a([9.9990174161763662e+03, 9.9982707680480811e+05, 9.9999975690502045e+05]),
        )
        state = complete_step(
            state, prob, IdaOptions(), a(0.001339349356604325), a(0.003720519687081918)
        )
        assert int(state.nst) == 3
        assert int(state.kk) == 3 and int(state.kused) == 2 and int(state.phase) == 0
        np.testing.assert_allclose(float(state.hh), 8.6598211441923079e-05, rtol=RTOL)
        np.testing.assert_allclose(
            np.asarray(state.phi),
            [
                [9.9999653607862404e-01, 3.4507668531616537e-06, 1.3154522852943008e-08],
                [-1.7319593976777956e-06, 1.7212358252111640e-06, 1.0723572466631820e-08],
                [1.8301885167926423e-12, -6.8365381237749594e-09, 6.8347079352581675e-09],
                [-4.2122294839452673e-13, -2.4605442771223734e-09, 2.4609655000707684e-09],
                [0.0, 0.0, 0.0], [0.0, 0.0, 0.0],
            ],
            rtol=RTOL,
        )

    def test3(self):
        # reference src/tests/complete_step.rs:203-307 (phase 1, order lower)
        state, prob = dummy_state()
        state = state._replace(
            nst=jnp.int64(12), kk=jnp.int32(3), kused=jnp.int32(2), knew=jnp.int32(2),
            phase=jnp.int32(1), hh=a(3.4384304814216195e-04),
            hused=a(3.4384304814216195e-04), rr=a(1.7379509697128959e+00),
            phi=a([
                [9.9989651723441231e-01, 3.6526684773526134e-05, 6.6956080814055887e-05],
                [-1.3744883185162313e-05, 1.6198423621611769e-07, 1.3582898948830698e-05],
                [1.8985246772161757e-09, -3.1828827656675421e-07, 3.1638975173052525e-07],
                [6.0782494622797157e-11, 3.6508292328524681e-07, -3.6514370600191418e-07],
                [-1.3875550771817554e-10, 1.3559268269012917e-06, -1.3557880688400603e-06],
                [-1.1465196356066767e-10, 2.0021935974335382e-07, -2.0010470777979317e-07],
            ]),
            ee=a([-3.0358000609489579e-11, -2.0478050395116282e-07, 2.0481086265121282e-07]),
            ewt=a([1.0000034827777174e+04, 9.9636062495315843e+05, 9.9334892491071229e+05]),
            # ns is needed by the (kk+1 >= ns) short-circuit; the C trace had
            # ns large enough not to trigger it at nst=12
            ns=jnp.int32(1),
        )
        state = complete_step(
            state, prob, IdaOptions(), a(0.04158869255496026), a(0.0434084688121079)
        )
        assert int(state.nst) == 13
        assert int(state.kk) == 2 and int(state.kused) == 3 and int(state.phase) == 1
        np.testing.assert_allclose(float(state.hh), 6.8768609628432390e-04, rtol=RTOL)
        np.testing.assert_allclose(float(state.rr), 2.2575213239991561e+00, rtol=RTOL)
        np.testing.assert_allclose(
            np.asarray(state.phi),
            [
                [9.9988277428017636e-01, 3.6530683152509582e-05, 8.0695036671266405e-05],
                [-1.3742954235991083e-05, 3.9983789834474729e-09, 1.3738955857210521e-05],
                [1.9289491712294831e-09, -1.5798585723267022e-07, 1.5605690837982388e-07],
                [3.0424494013307578e-11, 1.6030241933408400e-07, -1.6033284335070136e-07],
                [-3.0358000609489579e-11, -2.0478050395116282e-07, 2.0481086265121282e-07],
                [-1.1465196356066767e-10, 2.0021935974335382e-07, -2.0010470777979317e-07],
            ],
            rtol=RTOL,
        )


def test_get_solution():
    # reference src/tests/get_solution.rs:3-61
    state, _ = dummy_state()
    state = state._replace(
        hh=a(857870592.1885694),
        tn=a(3623118336.24244),
        kused=jnp.int32(4),
        hused=a(428935296.0942847),
        phi=a([
            [5.716499633245077e-07, 2.286601144610028e-12, 0.9999994283477499],
            [-7.779233860067279e-08, -3.111697299545603e-13, 7.779264957586927e-08],
            [2.339417551980491e-08, 9.35768837422748e-14, -2.33942692332846e-08],
            [-9.503346432581604e-09, -3.801349575270522e-14, 9.503383895634436e-09],
            [7.768373161310588e-09, 3.107357755532867e-14, -7.768407422476745e-09],
            [-2.242367216194777e-10, -8.970915966733762e-16, 2.242247401239887e-10],
        ]),
        psi=a([428935296.0942847, 857870592.1885694, 1072338240.235712,
               1286805888.282854, 1501273536.329997, 26020582.4876316]),
    )
    state, ok = get_solution(state, a(3623118336.24244))
    assert bool(ok)
    np.testing.assert_allclose(
        np.asarray(state.yy),
        [5.716499633245077e-07, 2.286601144610028e-12, 0.9999994283477499],
        rtol=RTOL,
    )
    np.testing.assert_allclose(
        np.asarray(state.yp),
        [-1.569167478317552e-16, -6.276676917262037e-22, 1.569173718962504e-16],
        rtol=1e-7,
    )


def test_standalone_step_matches_production_loop():
    """core.step.step() — the standalone one-internal-step retry machine
    (reference src/lib.rs step(); the production solve loop uses
    attempt_once directly) — advances an initialized state exactly like
    one production OneStep call: same tn/hh/order/counters, same phi."""
    import jax
    from functools import partial

    from ida_tpu import IDA, IdaTask
    from ida_tpu.core.state import IdaOptions
    from ida_tpu.core.step import step
    from ida_tpu.models import roberts_problem, ROBERTS_YY0, ROBERTS_YP0
    from ida_tpu.tol_control import tol_sv

    tol = tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))
    prob = roberts_problem(with_roots=False)

    # initialize + take 3 steps through the production loop, snapshot
    ida = IDA(prob, ROBERTS_YY0, ROBERTS_YP0, tol)
    for _ in range(3):
        ida.solve(0.4, itask=IdaTask.OneStep)
    snap = ida.state

    # production 4th step
    ida.solve(0.4, itask=IdaTask.OneStep)
    ref = ida.state

    # standalone 4th step from the same snapshot
    opts = IdaOptions()
    got = jax.jit(partial(step, problem=prob, opts=opts))(snap)

    assert int(got.status) == 0
    assert int(got.nst) == int(ref.nst)
    assert int(got.kused) == int(ref.kused)
    np.testing.assert_array_equal(np.asarray(got.tn), np.asarray(ref.tn))
    np.testing.assert_array_equal(np.asarray(got.hused),
                                  np.asarray(ref.hused))
    np.testing.assert_array_equal(np.asarray(got.phi), np.asarray(ref.phi))
    np.testing.assert_array_equal(np.asarray(got.ee), np.asarray(ref.ee))
