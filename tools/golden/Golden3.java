import com.clearspring.analytics.stream.quantile.TDigest;
import java.nio.ByteBuffer;
import java.util.Base64;
import java.util.Random;

// t-digest golden generator: deterministic value stream (LCG via
// java.util.Random(42)), both encodings + the reference's quantiles.
public class Golden3 {
    public static void main(String[] args) {
        double[] comps = {100.0, 50.0};
        int[] ns = {1, 100, 10000};
        for (double comp : comps) {
            for (int n : ns) {
                TDigest d = new TDigest(comp, new Random(12345));
                Random r = new Random(42);
                StringBuilder vals = new StringBuilder();
                for (int i = 0; i < n; i++) {
                    double x = Math.round(r.nextDouble() * 1e6) / 1e3; // 3dp values
                    d.add(x);
                    if (i > 0) vals.append(";");
                    vals.append(x);
                }
                ByteBuffer big = ByteBuffer.allocate(d.byteSize());
                d.asBytes(big);
                ByteBuffer small = ByteBuffer.allocate(d.byteSize());
                d.asSmallBytes(small);
                byte[] bigB = new byte[big.position()];
                big.flip(); big.get(bigB);
                byte[] smallB = new byte[small.position()];
                small.flip(); small.get(smallB);
                StringBuilder qs = new StringBuilder();
                if (n >= 100) {
                    for (double q : new double[]{0.01, 0.1, 0.5, 0.9, 0.99}) {
                        qs.append(d.quantile(q)).append(";");
                    }
                }
                System.out.println(comp + "," + n + "," + qs + ","
                        + Base64.getEncoder().encodeToString(bigB) + ","
                        + Base64.getEncoder().encodeToString(smallB));
            }
        }
    }
}
