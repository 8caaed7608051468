import com.clearspring.analytics.stream.cardinality.AdaptiveCounting;
import com.clearspring.analytics.stream.cardinality.LogLog;
import java.util.Base64;

// LogLog + AdaptiveCounting golden generator: register bytes + estimate.
// Row: kind,k,n,cardinality,base64(getBytes())
public class Golden6 {
    public static void main(String[] args) throws Exception {
        int[][] cfgs = {{10, 500}, {12, 20000}, {4, 10}};
        for (int[] cfg : cfgs) {
            LogLog ll = new LogLog(cfg[0]);
            AdaptiveCounting ac = new AdaptiveCounting(cfg[0]);
            for (int i = 0; i < cfg[1]; i++) {
                ll.offer("item-" + i);
                ac.offer("item-" + i);
            }
            System.out.println("loglog," + cfg[0] + "," + cfg[1] + "," + ll.cardinality() + ","
                    + Base64.getEncoder().encodeToString(ll.getBytes()));
            System.out.println("adaptive," + cfg[0] + "," + cfg[1] + "," + ac.cardinality() + ","
                    + Base64.getEncoder().encodeToString(ac.getBytes()));
        }
    }
}
