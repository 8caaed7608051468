import com.clearspring.analytics.stream.quantile.QDigest;
import java.util.Base64;

// QDigest golden generator. Values are the deterministic stream
// (i * 37) % 100000. Row: cf,n,q05,q50,q95,base64(serialize())
public class Golden7 {
    public static void main(String[] args) throws Exception {
        long[][] cfgs = {{64, 1000}, {256, 50000}, {32, 17}};
        for (long[] cfg : cfgs) {
            QDigest d = new QDigest((double) cfg[0]);
            for (long i = 0; i < cfg[1]; i++) {
                d.offer((i * 37) % 100000);
            }
            System.out.println(cfg[0] + "," + cfg[1] + ","
                    + d.getQuantile(0.05) + "," + d.getQuantile(0.5) + "," + d.getQuantile(0.95) + ","
                    + Base64.getEncoder().encodeToString(QDigest.serialize(d)));
        }
    }
}
