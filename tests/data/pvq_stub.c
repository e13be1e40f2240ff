/* C stand-in for the reference's ff_pvq_search_exact_avx (the repo's
 * reference build disables x86 asm, leaving this symbol undefined;
 * ffv2enc.c:127 declares it).  Greedy PVQ: distribute K unit pulses on
 * the dims maximizing (x.y)^2/(y.y), one pulse at a time.  |y_i| is
 * capped at K-1: the wire format codes |y_i| with a qp-ary CDF
 * (ffv2enc.c:181, alphabet size == qp), so |y_i| == qp would be an
 * out-of-bounds CDF write in the reference encoder.  Returns y.y. */
#include <math.h>

float ff_pvq_search_exact_avx(float *X, int *y, int K, int N)
{
    float ax[4096];
    float xy = 0.0f, yy = 0.0f;
    int i, p;
    for (i = 0; i < N; i++) {
        ax[i] = fabsf(X[i]);
        y[i] = 0;
    }
    for (p = 0; p < K; p++) {
        int best = -1;
        float bq = -1.0f;
        for (i = 0; i < N; i++) {
            float a, b, q;
            if (y[i] >= K - 1 && K > 1)
                continue;
            a = xy + ax[i];
            b = yy + 2.0f * y[i] + 1.0f;
            q = a * a / b;
            if (q > bq) {
                bq = q;
                best = i;
            }
        }
        if (best < 0)
            break;
        yy += 2.0f * y[best] + 1.0f;
        y[best] += 1;
        xy += ax[best];
    }
    for (i = 0; i < N; i++)
        if (X[i] < 0.0f)
            y[i] = -y[i];
    return yy;
}
