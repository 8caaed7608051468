import com.clearspring.analytics.stream.membership.BloomCalculations;

// BloomCalculations sweep: for a grid of max-false-positive targets,
// print "fpp,K,bucketsPerElement" so the Python replica of
// computeBucketsAndK can be pinned cell-for-cell (including the probs
// table's rounding quirks).
public class Golden11 {
    public static void main(String[] args) {
        double[] fpps = {
                0.5, 0.4, 0.393, 0.3, 0.283, 0.253, 0.237, 0.2, 0.16,
                0.147, 0.1, 0.092, 0.0804, 0.05, 0.0359, 0.02, 0.0133,
                0.01, 0.00846, 0.005, 0.00314, 0.002, 0.001, 0.000744,
                0.0005, 0.0002, 0.0001, 0.00005, 0.00001,
        };
        for (double fpp : fpps) {
            BloomCalculations.BloomSpecification spec =
                    BloomCalculations.computeBucketsAndK(fpp);
            try {
                // K / bucketsPerElement are package-private finals
                java.lang.reflect.Field fk = spec.getClass().getDeclaredField("K");
                java.lang.reflect.Field fb = spec.getClass().getDeclaredField("bucketsPerElement");
                fk.setAccessible(true);
                fb.setAccessible(true);
                System.out.println(fpp + "," + fk.getInt(spec) + "," + fb.getInt(spec));
            } catch (ReflectiveOperationException e) {
                throw new RuntimeException(e);
            }
        }
    }
}
