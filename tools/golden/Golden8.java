import com.clearspring.analytics.stream.cardinality.AdaptiveCounting;
import com.clearspring.analytics.stream.cardinality.CountThenEstimate;
import com.clearspring.analytics.stream.cardinality.HyperLogLog;
import com.clearspring.analytics.stream.cardinality.HyperLogLogPlus;
import com.clearspring.analytics.stream.cardinality.LinearCounting;
import java.util.Base64;

// CountThenEstimate golden generator (tipped + untipped wire bytes).
// Row: name,tipping,n,tipped,cardinality,base64(getBytes())
public class Golden8 {
    public static void main(String[] args) throws Exception {
        Object[][] cfgs = {
            {"tipped-lc", new CountThenEstimate(100, new LinearCounting.Builder(1024)), 500},
            {"tipped-ac", new CountThenEstimate(100, new AdaptiveCounting.Builder(12)), 500},
            {"tipped-hlc", new CountThenEstimate(100, new HyperLogLog.Builder(0.05)), 500},
            {"tipped-hlpc", new CountThenEstimate(100, new HyperLogLogPlus.Builder(14, 25)), 500},
            {"untipped-lc", new CountThenEstimate(1000, new LinearCounting.Builder(1024)), 50},
            {"untipped-hlpc", new CountThenEstimate(1000, new HyperLogLogPlus.Builder(14, 25)), 50},
        };
        for (Object[] cfg : cfgs) {
            CountThenEstimate cte = (CountThenEstimate) cfg[1];
            int n = (Integer) cfg[2];
            for (int i = 0; i < n; i++) {
                cte.offer("item-" + i);
            }
            System.out.println(cfg[0] + "," + n + "," + cte.tipped() + "," + cte.cardinality() + ","
                    + Base64.getEncoder().encodeToString(cte.getBytes()));
        }
        // integer-element untipped set (exercises boxed-Integer parse)
        CountThenEstimate ints = new CountThenEstimate(1000, new LinearCounting.Builder(1024));
        for (int i = 0; i < 30; i++) {
            ints.offer(i * 7);
        }
        System.out.println("untipped-lc-ints," + 30 + "," + ints.tipped() + "," + ints.cardinality() + ","
                + Base64.getEncoder().encodeToString(ints.getBytes()));

        // unicode elements incl. astral chars (modified-UTF8 strings)
        CountThenEstimate uni = new CountThenEstimate(1000, new LinearCounting.Builder(1024));
        String[] els = {"😀", "café", "日本語", "a🚀b"};
        for (String s : els) {
            uni.offer(s);
        }
        System.out.println("untipped-lc-unicode," + 4 + "," + uni.tipped() + "," + uni.cardinality() + ","
                + Base64.getEncoder().encodeToString(uni.getBytes()));
    }
}
