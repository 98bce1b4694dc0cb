package graft.quantizers;

import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.VectorSpecies;

/**
 * SIMD centroid-assignment micro-kernel (JDK incubator Vector API) — the
 * register-blocked GEMM shape the reference gets from Faiss'
 * knn_inner_product (lintdb/quantizers/CoarseQuantizer.cpp assign/train
 * paths). Only loaded when jdk.incubator.vector is present at runtime;
 * {@link CoarseQuantizer} falls back to a scalar loop with the IDENTICAL
 * accumulation order otherwise.
 *
 * <p>Layout and order: centroids arrive dim-major (row i = dim i of all k
 * centroids, contiguous), so one SIMD register holds one dim of
 * {@code S.length()} ADJACENT centroids and a centroid's score accumulates
 * dim-ascending in a SINGLE lane — no cross-lane reduction, hence no
 * reassociation: bit-identical to the scalar fallback at any vector width.
 * {@code add(mul)} is used instead of {@code fma} deliberately: the scalar
 * path rounds the product before adding, and fused multiply-add would not.
 *
 * <p>Register blocking: 4 tokens share each centroid-row load (the dominant
 * memory stream), and the 4 accumulator vectors live in registers across the
 * whole dim loop — score memory traffic drops from k*d stores per token
 * (the auto-vectorized saxpy formulation, measured memory-bound) to k.
 */
public final class AssignKernel {

    private static final VectorSpecies<Float> S = FloatVector.SPECIES_PREFERRED;

    private AssignKernel() {}

    /**
     * Argmax-inner-product assignment for n row-major (n x d) vectors
     * against k dim-major centroids; ties break to the lowest centroid id.
     */
    public static void assignBlock(float[] toks, int n, int d, float[] ct, int k, int[] out) {
        float[] s0 = new float[k];
        float[] s1 = new float[k];
        float[] s2 = new float[k];
        float[] s3 = new float[k];
        int bound = S.loopBound(k);
        int t = 0;
        for (; t + 4 <= n; t += 4) {
            int a0 = t * d, a1 = a0 + d, a2 = a1 + d, a3 = a2 + d;
            int c = 0;
            for (; c < bound; c += S.length()) {
                FloatVector acc0 = FloatVector.zero(S);
                FloatVector acc1 = FloatVector.zero(S);
                FloatVector acc2 = FloatVector.zero(S);
                FloatVector acc3 = FloatVector.zero(S);
                for (int i = 0; i < d; i++) {
                    FloatVector cv = FloatVector.fromArray(S, ct, i * k + c);
                    acc0 = acc0.add(cv.mul(toks[a0 + i]));
                    acc1 = acc1.add(cv.mul(toks[a1 + i]));
                    acc2 = acc2.add(cv.mul(toks[a2 + i]));
                    acc3 = acc3.add(cv.mul(toks[a3 + i]));
                }
                acc0.intoArray(s0, c);
                acc1.intoArray(s1, c);
                acc2.intoArray(s2, c);
                acc3.intoArray(s3, c);
            }
            for (; c < k; c++) { // < S.length() remainder centroids, scalar
                float p0 = 0f, p1 = 0f, p2 = 0f, p3 = 0f;
                for (int i = 0; i < d; i++) {
                    float cv = ct[i * k + c];
                    p0 += cv * toks[a0 + i];
                    p1 += cv * toks[a1 + i];
                    p2 += cv * toks[a2 + i];
                    p3 += cv * toks[a3 + i];
                }
                s0[c] = p0;
                s1[c] = p1;
                s2[c] = p2;
                s3[c] = p3;
            }
            out[t] = argmax(s0, k);
            out[t + 1] = argmax(s1, k);
            out[t + 2] = argmax(s2, k);
            out[t + 3] = argmax(s3, k);
        }
        for (; t < n; t++) { // < 4 remainder tokens
            int a0 = t * d;
            int c = 0;
            for (; c < bound; c += S.length()) {
                FloatVector acc0 = FloatVector.zero(S);
                for (int i = 0; i < d; i++) {
                    FloatVector cv = FloatVector.fromArray(S, ct, i * k + c);
                    acc0 = acc0.add(cv.mul(toks[a0 + i]));
                }
                acc0.intoArray(s0, c);
            }
            for (; c < k; c++) {
                float p0 = 0f;
                for (int i = 0; i < d; i++) {
                    p0 += ct[i * k + c] * toks[a0 + i];
                }
                s0[c] = p0;
            }
            out[t] = argmax(s0, k);
        }
    }

    /**
     * Full score matrix for n row-major (n x d) vectors against k dim-major
     * centroids, into out (row-major n x k) — the planning-side sibling of
     * {@link #assignBlock} (Searcher.computePlan fills the per-token
     * centroid score matrix with exactly this shape). Same lane-per-centroid
     * accumulation: bit-identical to a sequential per-centroid dot.
     */
    public static void scoreBlock(float[] toks, int n, int d, float[] ct, int k, float[] out) {
        int bound = S.loopBound(k);
        int t = 0;
        for (; t + 4 <= n; t += 4) {
            int a0 = t * d, a1 = a0 + d, a2 = a1 + d, a3 = a2 + d;
            int o0 = t * k, o1 = o0 + k, o2 = o1 + k, o3 = o2 + k;
            int c = 0;
            for (; c < bound; c += S.length()) {
                FloatVector acc0 = FloatVector.zero(S);
                FloatVector acc1 = FloatVector.zero(S);
                FloatVector acc2 = FloatVector.zero(S);
                FloatVector acc3 = FloatVector.zero(S);
                for (int i = 0; i < d; i++) {
                    FloatVector cv = FloatVector.fromArray(S, ct, i * k + c);
                    acc0 = acc0.add(cv.mul(toks[a0 + i]));
                    acc1 = acc1.add(cv.mul(toks[a1 + i]));
                    acc2 = acc2.add(cv.mul(toks[a2 + i]));
                    acc3 = acc3.add(cv.mul(toks[a3 + i]));
                }
                acc0.intoArray(out, o0 + c);
                acc1.intoArray(out, o1 + c);
                acc2.intoArray(out, o2 + c);
                acc3.intoArray(out, o3 + c);
            }
            for (; c < k; c++) {
                float p0 = 0f, p1 = 0f, p2 = 0f, p3 = 0f;
                for (int i = 0; i < d; i++) {
                    float cv = ct[i * k + c];
                    p0 += cv * toks[a0 + i];
                    p1 += cv * toks[a1 + i];
                    p2 += cv * toks[a2 + i];
                    p3 += cv * toks[a3 + i];
                }
                out[o0 + c] = p0;
                out[o1 + c] = p1;
                out[o2 + c] = p2;
                out[o3 + c] = p3;
            }
        }
        for (; t < n; t++) {
            int a0 = t * d, o0 = t * k;
            int c = 0;
            for (; c < bound; c += S.length()) {
                FloatVector acc0 = FloatVector.zero(S);
                for (int i = 0; i < d; i++) {
                    FloatVector cv = FloatVector.fromArray(S, ct, i * k + c);
                    acc0 = acc0.add(cv.mul(toks[a0 + i]));
                }
                acc0.intoArray(out, o0 + c);
            }
            for (; c < k; c++) {
                float p0 = 0f;
                for (int i = 0; i < d; i++) {
                    p0 += ct[i * k + c] * toks[a0 + i];
                }
                out[o0 + c] = p0;
            }
        }
    }

    private static int argmax(float[] s, int k) {
        int best = 0;
        float bs = Float.NEGATIVE_INFINITY;
        for (int c = 0; c < k; c++) {
            if (s[c] > bs) {
                bs = s[c];
                best = c;
            }
        }
        return best;
    }
}
